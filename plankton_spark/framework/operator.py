"""Operator protocol + parameter fingerprinting.

Mirrors plankton's Task (param struct-tags hashed to identify a run —
public knowledge, SURVEY.md §0/§2.12) with DataFrame-in/DataFrame-out
semantics instead of opaque side effects: operators compose into one
lazy Spark plan, so Catalyst optimizes across operator boundaries —
something the reference's black-box Run() bodies can never get.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame


def _canonical(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _canonical(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, Mapping):
        return {str(k): _canonical(v) for k, v in sorted(obj.items())}
    if isinstance(obj, (list, tuple)):
        return [_canonical(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    raise TypeError(f"unfingerprintable param type: {type(obj).__name__}")


def fingerprint(op_name: str, params: Any, input_fingerprints: list[str] | None = None) -> str:
    """sha256 over (name, canonical params, upstream fingerprints).

    Upstream fingerprints chain, so changing any ancestor's params
    invalidates the whole downstream cache — Luigi-style correctness
    for incremental re-runs.
    """
    payload = json.dumps(
        {
            "op": op_name,
            "params": _canonical(params),
            "inputs": sorted(input_fingerprints or []),
        },
        sort_keys=True,
        separators=(",", ":"),
    )
    return hashlib.sha256(payload.encode()).hexdigest()


class Operator:
    """A named, parameterized DataFrame transform.

    Subclass with a frozen dataclass ``Params`` and implement
    ``transform(inputs) -> DataFrame``; or use ``Operator.wrap`` for
    function-style operators.
    """

    name: str = "operator"

    def __init__(self, params: Any = None) -> None:
        self.params = params

    def transform(self, inputs: dict[str, DataFrame]) -> DataFrame:
        raise NotImplementedError

    def fingerprint(self, input_fingerprints: list[str] | None = None) -> str:
        return fingerprint(self.name, self.params, input_fingerprints)

    @classmethod
    def wrap(
        cls, name: str, fn: Callable[[dict[str, DataFrame]], DataFrame], params: Any = None
    ) -> "Operator":
        op = cls(params)
        op.name = name
        op.transform = fn  # type: ignore[method-assign]
        return op
