"""Plankton-parity pipeline framework (SURVEY.md §2.12).

The reference (`johnshiver/plankton`, a Go ETL framework — public
knowledge; the local snapshot is empty, see SURVEY.md §0) gives
pipeline authors: parameterized tasks, a dependency DAG, param-hash
result caching, scheduling hooks, and run observability. This package
re-expresses each capability Spark-first:

| plankton capability        | here                                      |
|----------------------------|-------------------------------------------|
| Task struct + Run()        | ``Operator`` (dataclass params, transform) |
| child-task DAG, cycle check| ``Pipeline.add(..., deps=[...])``          |
| param tag + hash           | ``fingerprint()`` (sha256 canonical JSON)  |
| GORM run-record DB         | JSON-lines ``RunLedger``                   |
| cache-window skip          | fingerprint + output-exists skip           |
| goroutine sibling execution| lazy Spark DAG (parallel stages for free)  |
| gRPC status server / CLI   | ``pipeline_status`` over the ledger        |
| terminal DAG viz           | ``Pipeline.describe()`` (text/mermaid)     |
"""

from plankton_spark.framework.operator import Operator, fingerprint
from plankton_spark.framework.pipeline import CycleError, Pipeline
from plankton_spark.framework.ledger import RunLedger

__all__ = ["Operator", "fingerprint", "Pipeline", "CycleError", "RunLedger"]
