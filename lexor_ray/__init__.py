"""lexor_ray — a Ray-Data-native data-processing / extraction engine.

A from-scratch reimplementation of the query and transform
capabilities of the reference document-conversion engine
(LaudateCorpus1/lexor, surveyed in ``SURVEY.md``), re-expressed as
``ray.data.Dataset`` pipelines: ``read_parquet → map_batches`` over
zero-copy Arrow batches with actor pools hosting compiled dialect
registries, plus the wide operators (dedup, similarity search, text
analysis, windowed aggregation) a large-scale training-data pipeline
needs.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
sessions are owned by ``bench.py``, CLI entry points and the test
fixture (driver contract, ``__ray_entry__.py``).
"""

from .extract import Extractor, extract_one

__version__ = "0.1.0"
__all__ = ["Extractor", "extract_one", "__version__"]
