"""PICMI interface smoke test: declarative setup runs end-to-end."""
import numpy as np

from fbpic_tpu import picmi
from fbpic_tpu.constants import c


def test_picmi_lwfa_setup(tmp_path):
    grid = picmi.CylindricalGrid(
        number_of_cells=[100, 20],
        lower_bound=[0., 0.], upper_bound=[10.e-6, 10.e-6],
        lower_boundary_conditions=["reflective", "open"],
        upper_boundary_conditions=["reflective", "open"],
        n_azimuthal_modes=2,
        moving_window_velocity=[0., c],
    )
    solver = picmi.ElectromagneticSolver(
        grid=grid, method="PSATD", cfl=1.0,
        source_smoother=picmi.BinomialSmoother(n_pass=1,
                                               compensation=False))
    sim = picmi.Simulation(solver=solver, particle_shape="linear")

    plasma = picmi.Species(
        particle_type="electron", name="plasma",
        initial_distribution=picmi.AnalyticDistribution(
            density_expression="1e24*exp(-(r/3e-6)**2)",
            lower_bound=[None, None, 8.e-6],
            upper_bound=[None, None, None],
            fill_in=True))
    sim.add_species(plasma, layout=picmi.GriddedLayout(
        grid=grid, n_macroparticle_per_cell={"r": 1, "z": 1, "theta": 4}))

    laser = picmi.GaussianLaser(
        wavelength=0.8e-6, waist=4.e-6, duration=8.e-15,
        focal_position=[0, 0, 5.e-6], centroid_position=[0, 0, 5.e-6],
        a0=0.5, polarization_direction=[0, 1, 0])
    sim.add_laser(laser, injection_method=None)

    sim.add_diagnostic(picmi.FieldDiagnostic(
        grid=grid, period=10, write_dir=str(tmp_path / "diags")))

    sim.step(10)
    assert sim.sim.iteration == 10
    Ez = sim.sim.get_interp_field("Ez")
    assert np.isfinite(Ez).all()
    rho = sim.sim.get_interp_field("rho", 0).real
    assert rho.min() < 0  # electron plasma deposited


if __name__ == "__main__":
    import tempfile, pathlib
    test_picmi_lwfa_setup(pathlib.Path(tempfile.mkdtemp()))
