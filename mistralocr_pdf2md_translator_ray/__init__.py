"""Ray-Data-native extraction engine.

A brand-new engine with the query/data-processing capabilities of
``gavanduffy/mistralocr-pdf2md-translator`` (reference read-only at
``/root/reference``), re-expressed Ray-Data-first per SURVEY.md:

- ``functions/``  pure, deterministic extraction kernels (oracle == production)
- ``sources/``    synthetic transcript fixtures + pruned parquet readers
- ``stages/``     Ray Data stages: actor pools, batch UDFs, shuffles
- ``pipelines/``  end-to-end pipelines + the driver-contract library queries
- ``state/``      per-partition parquet checkpoints with lineage + resume

No module here calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the driver, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"
