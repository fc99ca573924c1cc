"""Driver-contract pipelines over the testdata tables (SURVEY.md §2 ops).

Each public function takes ``sf_dir`` and returns a Dataset / DataFrame /
Table; its DuckDB oracle lives in ``baram_ray.pipelines.oracles``.
Float aggregate columns are rounded (6 dp unless noted) on BOTH sides so
the driver's value-hash is robust to fp summation order.
"""
