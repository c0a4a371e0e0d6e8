"""Named query plans: the reference's pipeline stages and dashboard
visuals re-expressed as (spark, sf_dir) -> DataFrame builders over the
synthetic test tables (FIXTURES.md §3 role mapping)."""
