"""Multi-process scan-parallel inference (SURVEY §2.7).

Launches TWO real jax.distributed processes (CPU backend, localhost
coordinator — the standard manual configuration maybe_initialize_
distributed consumes) that split a synthetic scene list exactly like
cli/test.py does on a pod, asserting:
  * the rendezvous sees both processes,
  * scene ownership is disjoint and covers the list,
  * the distributed run's per-view depth outputs are IDENTICAL to a
    single-process run over the same scenes (deterministic weights +
    deterministic per-scene inference => bitwise equality).

Replaces the reference's serial scene loop (test_uni.py:203-204).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTDIR = os.path.dirname(os.path.abspath(__file__))

CFG = dict(nviews=3, d0=16, height=32, width=64)
SCENES = ["scan_a", "scan_b", "scan_c"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def scene_tree(tmp_path_factory):
    from damvsnet_tpu.data.synthetic import export_synthetic_scene

    datadir = str(tmp_path_factory.mktemp("mp_scenes"))
    for i, scan in enumerate(SCENES):
        export_synthetic_scene(datadir, scan, height=CFG["height"],
                               width=CFG["width"], nviews=CFG["nviews"],
                               seed=100 + i)
    return datadir


@pytest.mark.slow
def test_two_process_scan_parallel(scene_tree, tmp_path):
    outdir = str(tmp_path / "mp_out")
    os.makedirs(outdir)
    port = _free_port()
    cfg = dict(CFG, scenes=SCENES, datadir=scene_tree, outdir=outdir)

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            MP_CONFIG=json.dumps(cfg),
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(TESTDIR, "_mp_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outputs.append(out.decode())
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-3000:]

    # ownership: disjoint, complete, rendezvous saw both processes
    owners = []
    for pid in range(2):
        with open(os.path.join(outdir, f"owner_{pid}.json")) as f:
            owners.append(json.load(f))
    assert all(o["process_count"] == 2 for o in owners)
    assert {o["process_index"] for o in owners} == {0, 1}
    claimed = [s for o in owners for s in o["scenes"]]
    assert sorted(claimed) == sorted(SCENES)
    assert not (set(owners[0]["scenes"]) & set(owners[1]["scenes"]))

    # every scene produced depth outputs in the shared outdir
    from damvsnet_tpu.core.pfm import read_pfm
    from damvsnet_tpu.core.pairs import read_pair_file
    mp_depths = {}
    for scan in SCENES:
        pair = read_pair_file(os.path.join(scene_tree, scan, "pair.txt"))
        assert pair, scan
        for ref, _ in pair:
            path = os.path.join(outdir, scan, f"depth_est/{ref:08d}.pfm")
            assert os.path.exists(path), path
            mp_depths[(scan, ref)] = read_pfm(path)[0]

    # single-process reference run over the full list -> identical outputs
    sp_out = str(tmp_path / "sp_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               MP_CONFIG=json.dumps(dict(cfg, outdir=sp_out)),
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    p = subprocess.run([sys.executable, os.path.join(TESTDIR, "_mp_worker.py")],
                       env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, timeout=1500)
    assert p.returncode == 0, p.stdout.decode()[-3000:]
    for (scan, ref), d in mp_depths.items():
        want = read_pfm(os.path.join(sp_out, scan,
                                     f"depth_est/{ref:08d}.pfm"))[0]
        np.testing.assert_array_equal(d, want, err_msg=f"{scan}/{ref}")
