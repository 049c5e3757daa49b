"""Pipeline entry points.

- crawl: the epoch loop (seed -> crawl -> checkpoint -> resume)
- frontier: flagship schedule pipeline + bench input synthesis
- verify: M10 corpus invariant vs reference
- relational: DuckDB-oracled relational operators
- dataops: dedup / ANN / text-analysis / multimodal operators
"""
