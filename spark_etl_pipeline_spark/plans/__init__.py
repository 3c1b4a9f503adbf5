"""Query plans: registry, relational suite, ETL pipeline."""
