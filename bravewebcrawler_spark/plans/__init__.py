"""Crawl plans: round micro-batch, driver loop, checkpoint/resume."""
