"""DBLP domain layer: the publications fact table (FIXTURES.md §B3),
legacy author-map views, and the reference's query workload (proxy Q1-Q4
+ interactive lookups) over the native nested schema."""
