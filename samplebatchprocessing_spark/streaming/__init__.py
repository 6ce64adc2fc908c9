"""Structured Streaming jobs (SURVEY §2B S1-S8) — the reference's
SQS consumer loop (GetJobs.py:21-40) made rigorous."""
