"""Multi-controller (multi-HOST) runtime test — 2 real OS processes.

The virtual 8-device mesh in conftest exercises sharding within ONE
process. This test exercises the actual multi-host runtime the framework
targets (SURVEY.md §2b: `jax.distributed.initialize`, same SPMD program
per host, host-0-gated I/O): two CPU processes, each with 2 local
devices, form one 4-device global mesh (data=2 × model=2) over gloo
collectives and run the full DQN train chunk. The run must agree with a
single-process run of the identical config/mesh-shape, and only process
0 may write logs.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]

from tpu2048.parallel import distributed_init, is_primary_host
distributed_init(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert is_primary_host() == (pid == 0)

# Host-0 gating: a JSONLLogger on a secondary host must write nothing.
from tpu2048.metrics import JSONLLogger
lg = JSONLLogger(os.path.join(outdir, f"log_{pid}.jsonl"), echo=False)
lg.log({"probe": pid}); lg.close()

from tpu2048.parallel.testkit import run_chunks, CONFIG_KW

digest = run_chunks(n_devices=4, model_parallel=2, chunks=2, **CONFIG_KW)
if pid == 0:
    with open(os.path.join(outdir, "digest.json"), "w") as fh:
        json.dump(digest, fh)
print(f"proc {pid} digest {digest}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_chunk(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    # Drain both pipes concurrently: sequential communicate() can
    # deadlock if the not-yet-drained worker fills its 64KB stdout pipe
    # mid-collective and stalls the one being waited on.
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        outs = [
            f.result()[0]
            for f in [
                pool.submit(p.communicate, timeout=540) for p in procs
            ]
        ]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    # Host-0 gating: only process 0's logger file may exist.
    assert (tmp_path / "log_0.jsonl").exists()
    assert not (tmp_path / "log_1.jsonl").exists()

    # Reference digest: same config, same (2, 2) mesh, ONE process using
    # the virtual devices (conftest provides 8 local CPU devices).
    from tpu2048.parallel.testkit import CONFIG_KW, run_chunks

    want = run_chunks(n_devices=4, model_parallel=2, chunks=2, **CONFIG_KW)
    got = json.loads((tmp_path / "digest.json").read_text())
    assert got["env_steps"] == want["env_steps"]
    assert got["episodes"] == want["episodes"]
    assert got["eps"] == pytest.approx(want["eps"], rel=1e-6)
    assert got["param_sum"] == pytest.approx(want["param_sum"], rel=1e-3)
    assert got["loss_sum"] == pytest.approx(want["loss_sum"], rel=1e-2)
