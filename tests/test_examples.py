"""The shipped example input scripts must run end-to-end (smoke mode).

Analog of the reference's tests/test_example_docs_scripts.py, which
runs its documented example scripts with reduced parameters.
"""
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("script", [
    "lwfa_script.py", "multichip_lwfa_script.py",
    "ionization_script.py", "boosted_frame_script.py"])
def test_example_script_runs(script, tmp_path):
    env = dict(os.environ)
    repo = os.path.dirname(EXAMPLES.rstrip(os.sep))
    # Drop the axon TPU site hook from PYTHONPATH: it forces axon
    # backend init inside jax.devices() even under JAX_PLATFORMS=cpu,
    # which hangs these CPU-only subprocesses whenever the TPU tunnel
    # is unreachable.  Other entries are preserved.
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and ".axon_site" not in p]
    env.update(
        FBPIC_TPU_EXAMPLE_SMOKE="1",
        JAX_PLATFORMS="cpu",
        JAX_ENABLE_X64="1",
        PYTHONPATH=os.pathsep.join([repo] + pp),
        XLA_FLAGS=(env.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=4").strip(),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, (script, out.stdout[-2000:],
                                 out.stderr[-2000:])
