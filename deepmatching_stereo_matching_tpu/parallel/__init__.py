"""Mesh construction and sharded pipelines (SURVEY.md §2.3/§2.4, §5.7/§5.8)."""

from .mesh import auto_mesh, make_mesh, make_mesh2d, tiled_geometry
from .runner import StreamReport, init_distributed, run_stream, scaling_sweep
from .sharded import (
    input_sharding,
    match_batch_dslab,
    match_batch_sharded,
    match_batch_tiled,
    pad_batch,
)
from .wtiled import match_batch_tiled2d, tiled2d_geometry

__all__ = [
    "StreamReport",
    "init_distributed",
    "run_stream",
    "scaling_sweep",
    "auto_mesh",
    "make_mesh",
    "make_mesh2d",
    "tiled_geometry",
    "tiled2d_geometry",
    "input_sharding",
    "match_batch_dslab",
    "match_batch_sharded",
    "match_batch_tiled",
    "match_batch_tiled2d",
    "pad_batch",
]
