"""Interpolator library (traced jnp; runs inside the jitted engine).

Reference parity: src/parcels/interpolators/_xinterpolators.py plus the
unstructured interpolators (UGRID support lands with UxGrid).
"""

from parcels_tpu.interpolators._base import ScalarInterpolator, VectorInterpolator
from parcels_tpu.interpolators.uxinterp import (
    Ux_Velocity,
    UxConstantFaceConstantZC,
    UxConstantFaceLinearZF,
    UxLinearNodeConstantZC,
    UxLinearNodeLinearZF,
)
from parcels_tpu.interpolators.xinterp import (
    CGrid_Tracer,
    CGrid_Velocity,
    XConstantField,
    XFreeslip,
    XLinear,
    XLinearInvdistLandTracer,
    XLinear_Velocity,
    XNearest,
    XPartialslip,
)

__all__ = [
    "Ux_Velocity",
    "UxConstantFaceConstantZC",
    "UxConstantFaceLinearZF",
    "UxLinearNodeConstantZC",
    "UxLinearNodeLinearZF",
    "CGrid_Tracer",
    "CGrid_Velocity",
    "ScalarInterpolator",
    "VectorInterpolator",
    "XConstantField",
    "XFreeslip",
    "XLinear",
    "XLinearInvdistLandTracer",
    "XLinear_Velocity",
    "XNearest",
    "XPartialslip",
]
