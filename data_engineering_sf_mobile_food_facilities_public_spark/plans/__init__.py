"""Whole-query plans: the flagship analytics query, the oracle-paired
relational operator suite, and the SF 11-table normalization pipeline."""
