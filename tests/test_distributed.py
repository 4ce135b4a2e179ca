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


def _run_train(args, env, timeout=900):
    proc = subprocess.run(
        [sys.executable, "-m", "maskunet_tpu.cli", "train",
         "--recipe", "synthetic_semantic", "--platform", "cpu",
         "--max-steps", "2", "--log-every", "0", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return proc


def _final_json(stdout: str) -> dict:
    import json
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no result json in output: {stdout[-2000:]}")


def test_two_process_train_matches_single_process(tmp_path):
    """REAL multi-process SPMD: two OS processes, 4 virtual CPU devices
    each, one global 8-device data mesh — the DP gradient psum crosses the
    process boundary over the distributed runtime's collectives (the DCN
    path of a TPU pod, SURVEY.md §2.5). Locks that the multi-process train
    step produces the same loss as the ordinary single-process 8-device
    mesh, and that both workers agree.
    """
    port = _free_port()
    base_env = dict(os.environ)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # fresh shared compile cache (the realistic pod setup): the user-level
    # ~/.cache may hold XLA:CPU AOT entries from a different machine whose
    # ISA features mismatch — loading those poisons Gloo context setup.
    # Deliberately NOT persisted across suite runs: a warm cache makes one
    # process skip the ~2 min CPU compile while its peer still compiles,
    # and the early process then blows Gloo's 30 s KeyValue rendezvous
    # deadline (reproduced: DEADLINE_EXCEEDED GetKeyValue flake). A fresh
    # cache keeps both processes compiling in lockstep.
    base_env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "xla-cache")

    def env_for(pid):
        return dict(base_env)

    common = ["--n-data", "8", "--distributed",
              "--coordinator", f"localhost:{port}",
              "--num-processes", "2"]
    p1 = subprocess.Popen(
        [sys.executable, "-m", "maskunet_tpu.cli", "train",
         "--recipe", "synthetic_semantic", "--platform", "cpu",
         "--max-steps", "2", "--log-every", "0", *common,
         "--process-id", "1", "--workdir", str(tmp_path / "w1")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env_for(1),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        p0 = _run_train([*common, "--process-id", "0",
                         "--workdir", str(tmp_path / "w0")], env_for(0))
        out1, err1 = p1.communicate(timeout=300)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert p0.returncode == 0, p0.stderr[-4000:]
    assert p1.returncode == 0, err1[-4000:]
    r0, r1 = _final_json(p0.stdout), _final_json(out1)
    # both workers computed the identical replicated state
    assert abs(r0["best_loss"] - r1["best_loss"]) < 1e-5, (r0, r1)

    # single-process 8-device reference run: same mesh shape, no
    # distributed runtime — multi-process collectives must not change
    # the numerics (tolerance covers reduction-order ulps)
    env8 = dict(os.environ)
    env8["JAX_PLATFORMS"] = "cpu"
    env8["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    ps = _run_train(["--n-data", "8",
                     "--workdir", str(tmp_path / "ws")], env8)
    assert ps.returncode == 0, ps.stderr[-4000:]
    rs = _final_json(ps.stdout)
    assert abs(r0["best_loss"] - rs["best_loss"]) < 1e-4, (r0, rs)
    # only the lead process writes checkpoints
    assert any((tmp_path / "w0").rglob("*")), "lead wrote no checkpoint"


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
