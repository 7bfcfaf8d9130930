"""PICMI interface: the portable declarative input layer.

Maps PICMI-standard objects (CylindricalGrid, Species, GaussianLaser,
diagnostics...) onto fbpic_tpu objects; behavioral reference:
/root/reference/fbpic/picmi/.  When the `picmistandard` package is
installed the classes subclass it; otherwise a self-contained
implementation of the same signatures is used (the standard is a thin
argument container either way).
"""
from .simulation import (
    Simulation, CylindricalGrid, ElectromagneticSolver, BinomialSmoother,
    GaussianLaser, LaserAntenna, Species, MultiSpecies,
    UniformDistribution, AnalyticDistribution, GaussianBunchDistribution,
    ParticleListDistribution, GriddedLayout, PseudoRandomLayout,
    FieldDiagnostic, ParticleDiagnostic, LabFrameFieldDiagnostic,
    LabFrameParticleDiagnostic, Mirror, ConstantAppliedField,
    AnalyticAppliedField,
)

codename = "fbpic"

__all__ = [
    "Simulation", "CylindricalGrid", "ElectromagneticSolver",
    "BinomialSmoother", "GaussianLaser", "LaserAntenna", "Species",
    "MultiSpecies", "UniformDistribution", "AnalyticDistribution",
    "GaussianBunchDistribution", "ParticleListDistribution",
    "GriddedLayout", "PseudoRandomLayout", "FieldDiagnostic",
    "ParticleDiagnostic", "LabFrameFieldDiagnostic",
    "LabFrameParticleDiagnostic", "Mirror", "ConstantAppliedField",
    "AnalyticAppliedField", "codename",
]
