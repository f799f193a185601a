"""Search accuracy profiles (reference ``--accuracy fast|balanced|high``,
QUERY_PARAMETERS.md "Search Accuracy" / ``cli.py:4238-4241``).

The reference treats the profile as an opaque knob passed down to the
vector-search layer (hnswlib ``ef``; ignored with a logged warning where
the backend can't honor it, ``semantic_query_manager.py:980``).  Here the
profile resolves to concrete ANN parameters:

- **IVF store** (:class:`..ann.store.VectorStoreSearcher`): the fraction of
  centroid cells probed — I/O and recall both scale with ``nprobe``.
- **HNSW**: the beam width ``ef`` — wider beams re-rank more candidates.

Profiles are deliberately coarse (the reference exposes exactly three);
callers needing precise control pass ``nprobe=`` / ``ef_search=`` directly,
and passing both is a parameter conflict (mirrors the reference's
regex+fuzzy conflict validation style).
"""

from __future__ import annotations

ACCURACY_PROFILES = ("fast", "balanced", "high")


def validate_accuracy(accuracy: str) -> str:
    if accuracy not in ACCURACY_PROFILES:
        raise ValueError(
            f"unknown accuracy {accuracy!r}; expected one of {ACCURACY_PROFILES}"
        )
    return accuracy


def resolve_nprobe(accuracy: str, n_centroids: int) -> int:
    """IVF probe count for a profile: fast ≈ 1/8 of cells, balanced ≈ 1/4,
    high ≈ 1/2 — floors keep tiny stores functional."""
    validate_accuracy(accuracy)
    frac = {"fast": 8, "balanced": 4, "high": 2}[accuracy]
    floor = {"fast": 1, "balanced": 2, "high": 4}[accuracy]
    return max(floor, min(n_centroids, n_centroids // frac))


def resolve_ef(accuracy: str, k: int) -> int:
    """HNSW beam width for a profile (≥ k by construction)."""
    validate_accuracy(accuracy)
    mult, floor = {"fast": (1, 32), "balanced": (2, 64), "high": (4, 128)}[accuracy]
    return max(k * mult, floor)
