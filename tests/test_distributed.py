"""`--distributed` smoke test (VERDICT r2 weak #6).

Real multi-host cannot run in this environment, but the testable slice —
`jax.distributed.initialize()` with an explicit 1-process coordinator,
then a mesh-sharded train step through the CLI — can and must. Runs in a
subprocess because distributed init must happen before the backend is
touched (this test process already initialized jax).
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_distributed_initialize_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "maskunet_tpu.cli", "train",
         "--recipe", "synthetic_semantic", "--platform", "cpu",
         "--distributed", "--coordinator", f"localhost:{port}",
         "--num-processes", "1", "--process-id", "0",
         "--max-steps", "1", "--log-every", "0",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-4000:]
