"""Multi-host smoke: two OS processes, gloo CPU collectives, the mp axis
spanning processes (VERDICT round-1 item 5; BASELINE config 4's code path
— scaling itself still needs real multi-host hardware)."""
import os
import pathlib
import re
import socket
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cross_host_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # subprocesses: no conftest to force it
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # share the CPU test compile cache so the second process hits it
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax-cpu-tests"

    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "malio_tpu.distributed.multihost",
                    "--coordinator",
                    f"127.0.0.1:{port}",
                    "--nprocs",
                    "2",
                    "--pid",
                    str(pid),
                ],
                cwd=ROOT,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        # generous: both subprocesses share the 2-core host with the
        # pytest process, and a cold compile cache makes the sharded
        # step's compile slow (103 s isolated, >560 s seen in-suite)
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"
        assert "multihost smoke ok" in out, out[-2000:]
        # the backend must actually be multi-process: sitecustomize's TPU
        # plugin clobbers JAX_PLATFORMS=cpu (multihost.initialize restores
        # it); before that fix both subprocesses silently grabbed the TPU
        # chip as two independent single-process runs and every
        # cross-host assert degenerated to mp=1
        assert f"pid {pid}/2" in out, out[-2000:]
        assert "mp=2" in out, out[-2000:]
        m = re.search(r"map shard rows (\d+)/(\d+)", out)
        assert m and int(m.group(1)) * 2 <= int(m.group(2)) + 2, m.group(0)
