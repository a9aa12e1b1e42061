"""Iterative micro-batch crawl loop + checkpoint/resume (SURVEY §2.11)."""
