"""Sources & sinks (reference S1-S11, SURVEY.md section 2.1)."""
