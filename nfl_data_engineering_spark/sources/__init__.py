"""Connector adapters: REST JSON (odds), HTML tables (rankings scraper),
multimodal binary payloads. Network fetches are pluggable/stubbed — the
Spark-side plumbing (schemas, partitioning, batch shapes) is real."""
