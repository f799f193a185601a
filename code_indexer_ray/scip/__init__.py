"""SCIP-analog code-intelligence surface (reference ``scip/``): symbol
extraction lives in :mod:`..text.symbols`; this package adds the call-graph
queries (:mod:`.graph`) and the persisted occurrence store (:mod:`.store`)."""

from .graph import (
    affected_files,
    analyze_impact,
    dependencies,
    dependents,
    trace_call_chain,
    transitive_dependencies,
)
from .store import SymbolStore, build_symbol_store, fnv64, verify_store

__all__ = [
    "affected_files",
    "analyze_impact",
    "dependencies",
    "dependents",
    "trace_call_chain",
    "transitive_dependencies",
    "SymbolStore",
    "build_symbol_store",
    "fnv64",
    "verify_store",
]
