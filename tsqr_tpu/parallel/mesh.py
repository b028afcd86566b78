"""Device-mesh helpers for the distributed TSQR/BlockQR layer.

The reference is a single-GPU library with no communication backend
(SURVEY.md §2 'parallelism strategies'); the TPU build's distributed story
is TSQR's own communication-avoiding structure: shard the tall m axis over
a 1-D mesh, run the local tree per chip, and reduce the tiny n x n R
factors over ICI (all-gather / psum-tree), then broadcast the Q correction
back down — exactly the top log2(n_chips) levels of the reference's
R-tree (tsqr.cu:1121-1159) lifted onto the interconnect.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


SLICE_AXIS = "slices"
CHIP_AXIS = "chips"


def make_mesh2d(n_slices: int, chips_per_slice: int,
                slice_axis: str = SLICE_AXIS,
                chip_axis: str = CHIP_AXIS) -> Mesh:
    """2-D (slices, chips_per_slice) mesh for the hierarchical tree:
    the chip axis rides ICI (fast, within a slice), the slice axis rides
    DCN (slow, across slices).  On real multi-slice hardware pass
    devices ordered so consecutive groups of ``chips_per_slice`` share a
    slice — jax.devices() already orders by (slice, chip)."""
    devs = jax.devices()[: n_slices * chips_per_slice]
    assert len(devs) == n_slices * chips_per_slice, (
        f"need {n_slices * chips_per_slice} devices, have {len(devs)}")
    return Mesh(np.array(devs).reshape(n_slices, chips_per_slice),
                (slice_axis, chip_axis))


def row_sharding(mesh: Mesh, axis: str | tuple = ROWS_AXIS) -> NamedSharding:
    """Sharding for an (m, n) operand: rows split over the mesh axis
    (or, for a 2-D mesh, over both axes — slice-major row blocks)."""
    if len(mesh.axis_names) > 1 and axis == ROWS_AXIS:
        axis = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axis, None))


def vec_sharding(mesh: Mesh, axis: str | tuple = ROWS_AXIS) -> NamedSharding:
    """Sharding for an (m,) vector (e.g. lstsq's b): split like the
    row axis of the matrix it pairs with."""
    if len(mesh.axis_names) > 1 and axis == ROWS_AXIS:
        axis = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
