"""Structured-streaming variants of the batch jobs."""
