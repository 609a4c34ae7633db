"""Pipeline stages mirroring the reference DAG (SURVEY.md §3.1):
extract → normalize → enrich (skills/companies/seniority) → marts →
rank → report, each a pure DataFrame→DataFrame transform plus a thin
storage layer (parquet tables with merge-rewrite semantics)."""
