"""Parametric (rho, theta) line geometry.

TPU-native counterpart of reference geometry.h/geometry.cpp. Lines are
represented as (rho, theta) pairs; "none" is theta == FLT_MAX
(geometry.cpp:10-12). Both scalar-Python and jax versions are provided; the
jax versions operate on stacked line tensors so all four card corners can be
intersected in one fused op (dmz.cpp:425-428).
"""

import math
from dataclasses import dataclass

import jax.numpy as jnp

_FLT_MAX = 3.4028235e38


@dataclass(frozen=True)
class ParametricLine:
    rho: float
    theta: float


def parametric_line_none() -> ParametricLine:
    return ParametricLine(0.0, _FLT_MAX)


def is_parametric_line_none(line: ParametricLine) -> bool:
    return line.theta == _FLT_MAX


def parametric_intersect(line1: ParametricLine, line2: ParametricLine):
    """geometry.cpp:14-32. Returns (ok, x, y)."""
    if is_parametric_line_none(line1) or is_parametric_line_none(line2):
        return False, 0.0, 0.0
    c1, s1 = math.cos(line1.theta), math.sin(line1.theta)
    c2, s2 = math.cos(line2.theta), math.sin(line2.theta)
    det = c1 * s2 - s1 * c2
    if det < 1e-10:
        return False, 0.0, 0.0
    x = (s2 * line1.rho - s1 * line2.rho) / det
    y = (-c2 * line1.rho + c1 * line2.rho) / det
    return True, x, y


def parametric_intersect_jax(rho1, theta1, rho2, theta2):
    """Vectorized intersect; inputs may be batched. Returns (ok, x, y).

    Mirrors geometry.cpp:14-32 including the det < 1e-10 rejection (note the
    reference checks the *signed* determinant, not its absolute value).
    """
    c1, s1 = jnp.cos(theta1), jnp.sin(theta1)
    c2, s2 = jnp.cos(theta2), jnp.sin(theta2)
    det = c1 * s2 - s1 * c2
    ok = det >= 1e-10
    safe_det = jnp.where(ok, det, 1.0)
    x = (s2 * rho1 - s1 * rho2) / safe_det
    y = (-c2 * rho1 + c1 * rho2) / safe_det
    return ok, jnp.where(ok, x, 0.0), jnp.where(ok, y, 0.0)


def line_by_shifting_origin(line: ParametricLine, x_offset, y_offset) -> ParametricLine:
    """geometry.cpp:34-43: re-express an ROI-local line in full-image coords."""
    if x_offset == 0:
        offset_angle = math.pi / 2.0
    else:
        offset_angle = math.atan(float(y_offset) / float(x_offset))
    delta_angle = line.theta - offset_angle + math.pi / 2.0
    offset_magnitude = math.sqrt(x_offset * x_offset + y_offset * y_offset)
    delta_rho = offset_magnitude * math.cos(math.pi / 2.0 - delta_angle)
    return ParametricLine(line.rho + delta_rho, line.theta)


def line_by_shifting_origin_jax(rho, theta, x_offset, y_offset):
    """Jax version of geometry.cpp:34-43; offsets are static Python ints."""
    if x_offset == 0:
        offset_angle = math.pi / 2.0
    else:
        offset_angle = math.atan(float(y_offset) / float(x_offset))
    delta_angle = theta - offset_angle + math.pi / 2.0
    offset_magnitude = math.sqrt(x_offset * x_offset + y_offset * y_offset)
    delta_rho = offset_magnitude * jnp.cos(math.pi / 2.0 - delta_angle)
    return rho + delta_rho, theta


def inset_rect(x, y, w, h, dx, dy):
    """cvInsetRect (geometry.h:10-15): shrink a rect by (dx, dy) per side."""
    return x + dx, y + dy, w - 2 * dx, h - 2 * dy
