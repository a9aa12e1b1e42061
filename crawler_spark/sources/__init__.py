"""Table IO and the deterministic mock web used by crawl tests/bench."""
