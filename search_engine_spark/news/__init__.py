"""News-ingest domain: RSS/Atom feed parsing, article upsert, feed
freshness — modeled from XML fixtures (reference ``app/batch/news_fetcher.py``
minus the live HTTP fetch loop)."""
