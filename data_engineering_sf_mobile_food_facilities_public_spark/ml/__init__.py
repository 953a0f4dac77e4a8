"""ML surface (reference section 2.11: VectorAssembler + LinearRegression
imports at /root/reference/airflow.py:21-23; report.pdf p.9 regression)."""
