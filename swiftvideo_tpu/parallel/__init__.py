"""Device-mesh scale-out: sharded multi-stream mixing walls."""

from .wall import MixingWall, make_mesh

__all__ = ["MixingWall", "make_mesh"]
