"""End-to-end pipelines and the relational query library."""
