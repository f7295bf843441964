"""Clustering options — mirrors the reference engine's option surface.

Reference: packages/arrow-supercluster/src/arrow-cluster-engine.ts:21-27
(option names); the engine constructor DEFAULT is radius=40
(arrow-cluster-engine.ts:42). We deliberately default to radius=75 — the
option set used by every reference test and benchmark
(tests/engine.test.ts:12, benchmarks/run.ts:35-42) — so parity suites
compare like-for-like; pass ClusterOptions(radius=40) for
reference-library-default behavior.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ClusterOptions:
    radius: float = 75.0
    extent: int = 512
    min_zoom: int = 0
    max_zoom: int = 16
    min_points: int = 2

    @property
    def leaf_zoom(self) -> int:
        """The unclustered level (reference indexes raw points at maxZoom+1,
        arrow-cluster-engine.ts:103-105)."""
        return self.max_zoom + 1

    def cell_scale(self, zoom: int) -> float:
        """Points whose Mercator coords fall in the same (floor(x*scale),
        floor(y*scale)) cell at this scale are within ~radius px of each
        other at `zoom` — the grid decomposition of the reference's
        within-radius search r = radius/(extent * 2^zoom)
        (arrow-cluster-engine.ts:356)."""
        return self.extent * float(2**zoom) / self.radius


DEFAULT_OPTIONS = ClusterOptions()
