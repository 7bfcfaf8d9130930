"""Compatibility alias: `fbpic.openpmd_diag` -> `fbpic_tpu.openpmd_diag`."""
from .diagnostics import *  # noqa: F401,F403
from .diagnostics import (
    OpenPMDDiagnostic, FieldDiagnostic, ParticleDiagnostic,
    ParticleChargeDensityDiagnostic, set_periodic_checkpoint,
    restart_from_checkpoint, InputScriptDiagnostic,
)
from .diagnostics import (  # noqa: F401
    BoostedFieldDiagnostic, BackTransformedFieldDiagnostic,
    BoostedParticleDiagnostic, BackTransformedParticleDiagnostic,
)
