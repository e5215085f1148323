"""parcels_tpu — a TPU-native Lagrangian ocean particle-advection framework.

A ground-up JAX/XLA/Pallas redesign with the capabilities of Parcels
(Parcels-code/Parcels v4): gridded ocean-model velocity fields in, composable
advection/diffusion kernels over millions of particles, trajectories out —
with the whole time-stepping hot loop compiled to a single XLA program per
output interval, and scaling across TPU meshes via jax.sharding.

Quick start::

    import numpy as np
    from parcels_tpu import FieldSet, ParticleSet, ParticleFile
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu.datasets import radial_rotation_dataset

    fs = FieldSet.from_sgrid_conventions(radial_rotation_dataset(), mesh="flat")
    pset = ParticleSet(fs, x=[40.0], y=[30.0])
    pset.execute(AdvectionRK4, dt=np.timedelta64(30, "s"), runtime=np.timedelta64(1, "D"))
"""

from parcels_tpu._core.basegrid import BaseGrid
from parcels_tpu._core.field import Field, VectorField
from parcels_tpu._core.fieldset import FieldSet
from parcels_tpu._core.grid import XGrid
from parcels_tpu._core.uxgrid import UxGrid
from parcels_tpu._core.mesh import EARTH_RADIUS, FlatMesh, SphericalMesh, get_mesh
from parcels_tpu._core.options import EngineOptions
from parcels_tpu._core.particle import Particle, ParticleClass, Variable, get_default_particle
from parcels_tpu._core.particlefile import ParticleFile, read_particlefile
from parcels_tpu._core.particleset import ParticleSet
from parcels_tpu._core.statuscodes import (
    AllParcelsErrorCodes,
    FieldInterpolationError,
    FieldOutOfBoundError,
    FieldOutOfBoundSurfaceError,
    FieldSamplingError,
    GridSearchingError,
    KernelError,
    OutsideTimeInterval,
    StatusCode,
)
from parcels_tpu import convert, io, kernels, profiling, tutorial
from parcels_tpu._logging import logger
from parcels_tpu.io.zarrstore import open_raw_zarr
from parcels_tpu._core.timeutils import CFDatetime, TimeInterval
from parcels_tpu._core.warnings_ import (
    FieldEvalWarning,
    FieldSetWarning,
    FileWarning,
    KernelWarning,
    ParticleSetWarning,
)
from parcels_tpu.interpolators import (
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
from parcels_tpu.kernels import (
    AdvectionAnalytical,
    AdvectionDiffusionEM,
    AdvectionDiffusionM1,
    AdvectionEE,
    AdvectionRK2,
    AdvectionRK2_3D,
    AdvectionRK2_3D_CROCO,
    AdvectionRK4,
    AdvectionRK4_3D,
    AdvectionRK45,
    DiffusionUniformKh,
    SampleOmegaCroco,
)

__version__ = "0.1.0"

__all__ = [
    "EARTH_RADIUS",
    "AdvectionAnalytical",
    "AdvectionDiffusionEM",
    "AdvectionDiffusionM1",
    "AdvectionEE",
    "AdvectionRK2",
    "AdvectionRK2_3D",
    "AdvectionRK2_3D_CROCO",
    "AdvectionRK4",
    "AdvectionRK4_3D",
    "AdvectionRK45",
    "AllParcelsErrorCodes",
    "BaseGrid",
    "CGrid_Tracer",
    "CGrid_Velocity",
    "DiffusionUniformKh",
    "EngineOptions",
    "Field",
    "FieldEvalWarning",
    "FieldInterpolationError",
    "FieldOutOfBoundError",
    "FieldOutOfBoundSurfaceError",
    "FieldSamplingError",
    "FieldSet",
    "FieldSetWarning",
    "FileWarning",
    "FlatMesh",
    "GridSearchingError",
    "KernelError",
    "KernelWarning",
    "OutsideTimeInterval",
    "CFDatetime",
    "Particle",
    "ParticleClass",
    "ParticleFile",
    "ParticleSet",
    "ParticleSetWarning",
    "SampleOmegaCroco",
    "SphericalMesh",
    "StatusCode",
    "TimeInterval",
    "UxGrid",
    "Variable",
    "VectorField",
    "convert",
    "io",
    "kernels",
    "logger",
    "open_raw_zarr",
    "profiling",
    "tutorial",
    "XConstantField",
    "XFreeslip",
    "XGrid",
    "XLinear",
    "XLinearInvdistLandTracer",
    "XLinear_Velocity",
    "XNearest",
    "XPartialslip",
    "get_default_particle",
    "get_mesh",
    "read_particlefile",
]

# register the ``ds.sgrid`` accessor on real xarray when present
# (reference _sgrid/accessor.py:12); xrlite datasets carry it natively
from parcels_tpu._sgrid import register_xarray_accessor as _reg_sgrid

_reg_sgrid()
del _reg_sgrid
