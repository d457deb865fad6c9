"""jax.distributed process-group execution == single-process, bitwise.

Two OS processes join one JAX process group (gloo CPU backend), each
assembles a disjoint region shard, and the shard transcript-set payloads
ride process_allgather collectives; process 0 writes the merged outputs
(parallel/jaxdist.py).  This is the DCN-analogue of the reference's shared
memory + mutex cross-sample state (meta/incubator.cc:523-611, SURVEY §2.8).
"""

import os
import socket
import subprocess
import sys

from aletsch_tpu.meta.incubator import Incubator

from test_distributed import make_cohort, make_params


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_jaxdist_two_processes_equal_single(tmp_path):
    bl, region_len = make_cohort(tmp_path)

    # in-process single-host reference run
    params1 = make_params(bl, region_len, str(tmp_path / "single.gtf"),
                          str(tmp_path / "single_gtf"))
    inc1 = Incubator(params1)
    inc1.resolve()

    coord = "127.0.0.1:%d" % _free_port()
    out_dir = str(tmp_path / "dist_gtf")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one local device per process: the cross-process axis is the point here
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "aletsch_tpu",
               "-i", bl, "-o", str(tmp_path / "dist.gtf"), "-d", out_dir,
               "-g", str(region_len),
               "--jax_dist", str(pid), "2", coord]
        procs.append(subprocess.Popen(
            cmd, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    assert open(tmp_path / "single.gtf").read() == \
        open(tmp_path / "dist.gtf").read()
    for name in sorted(os.listdir(tmp_path / "single_gtf")):
        a = open(os.path.join(tmp_path, "single_gtf", name)).read()
        b = open(os.path.join(out_dir, name)).read()
        assert a == b, name


def test_jaxdist_launcher_three_processes(tmp_path):
    """--jax_dist_launch spawns the whole group (odd process count: the
    region grid does not divide evenly) and matches single-process."""
    bl, region_len = make_cohort(tmp_path)
    params1 = make_params(bl, region_len, str(tmp_path / "single.gtf"),
                          str(tmp_path / "single_gtf"))
    inc1 = Incubator(params1)
    inc1.resolve()

    out_dir = str(tmp_path / "launch_gtf")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    cmd = [sys.executable, "-m", "aletsch_tpu",
           "-i", bl, "-o", str(tmp_path / "launch.gtf"), "-d", out_dir,
           "-g", str(region_len), "--jax_dist_launch", "3"]
    p = subprocess.run(
        cmd, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=300)
    assert p.returncode == 0, p.stdout.decode(errors="replace")[-2000:]
    assert open(tmp_path / "single.gtf").read() == \
        open(tmp_path / "launch.gtf").read()
