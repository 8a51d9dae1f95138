"""Real multi-host execution test (VERDICT r2 #2): 2 jax.distributed
processes x 4 virtual CPU devices run ONE sharded train step (dp2 x fsdp2 x
tp2) with process-striped data loading and a tp=2 greedy decode whose mesh
crosses the process boundary — then the results are compared against a
single-process 8-device run of the SAME global batch.

This covers what the single-process dryrun structurally cannot: forming
global batches from process-local rows (`shard_batch` ->
``make_array_from_process_local_data``), parameter placement onto
non-addressable devices (`shard_params` -> ``make_array_from_callback``),
and per-process dataset striping (``process_batch_slice``) — the
reference's per-rank DistributedSampler semantics (llava_trainer.py:353-407)
over gloo collectives instead of NCCL.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mp") / "result")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)            # worker sets its own 4-device flag
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
         str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"
    return [json.load(open(f"{out}.{pid}")) for pid in range(2)]


class TestTwoProcessTrainStep:
    def test_processes_agree_exactly(self, mp_results):
        """Both processes observe identical replicated outputs — loss,
        grad norm, post-update param checksum, and greedy tokens."""
        a, b = mp_results
        assert a["loss"] == b["loss"]
        assert a["grad_norm"] == b["grad_norm"]
        assert a["checksum"] == b["checksum"]
        assert a["tokens"] == b["tokens"]

    def test_matches_single_process_run(self, mp_results):
        """The 2-process run reproduces a single-process 8-device run of
        the same global batch (gloo cross-host collectives may reorder
        reductions -> tolerance, not bitwise)."""
        import __graft_entry__ as g
        from video3d_tpu.config import ModelConfig
        from video3d_tpu.models import generate
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.parallel.mesh import (create_mesh, shard_batch,
                                               shard_params)
        from video3d_tpu.train.optim import OptimConfig, build_optimizer
        from video3d_tpu.train.train_step import (create_train_state,
                                                  train_step)

        cfg = ModelConfig.tiny()
        mesh = create_mesh(dp=2, tp=2, devices=jax.devices()[:8])
        params = shard_params(lv3d.init_model(jax.random.PRNGKey(0), cfg),
                              mesh)
        tx = build_optimizer(params, OptimConfig(total_steps=10))
        state = create_train_state(params, tx)
        batch = shard_batch(g._make_batch(cfg, B=4, V=2, L=256), mesh)
        with mesh:
            state, metrics = train_step(state, batch, cfg, tx, remat=True,
                                        force_chunked_ce=True,
                                        compute_dtype=jnp.bfloat16)
        loss = float(metrics["lm_loss"])

        @jax.jit
        def checksum(p):
            return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                       for x in jax.tree.leaves(p))

        cs = float(checksum(state.params))

        for r in mp_results:
            np.testing.assert_allclose(r["loss"], loss, rtol=2e-3)
            np.testing.assert_allclose(r["checksum"], cs, rtol=1e-4)

        # greedy decode parity vs single-device (exact: argmax over a
        # tiny random model has no near-ties at this scale)
        p_inf = lv3d.init_model(jax.random.PRNGKey(0), cfg)
        batch_inf = g._make_batch(cfg, B=1, V=2, L=256)
        st = generate.start_decode(p_inf, cfg, batch_inf, max_cache_len=288)
        _, toks_ref = generate.decode_chunk(p_inf, cfg, st, chunk=8,
                                            eos_token_id=-1)
        toks_ref = np.asarray(toks_ref).tolist()
        for r in mp_results:
            assert r["tokens"] == toks_ref, (r["tokens"], toks_ref)


class TestDryrun16:
    """16-virtual-device stage (VERDICT r4 #8): pp x dp x fsdp x tp all > 1
    on a 2x2x2x2 mesh via the partial-auto pipeline, plus an asymmetric
    2-slice x 8-device multislice with injected slice ids. Spawned as a
    subprocess (the suite's backend is pinned to 8 devices); all parity
    asserts live in tests/dryrun16_worker.py — here we check it exits 0
    and the reported losses agree across mesh shapes."""

    def test_dryrun16_worker(self, tmp_path):
        out = str(tmp_path / "res.json")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env.pop("XLA_FLAGS", None)      # worker sets its own 16-device flag
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tests",
                                          "dryrun16_worker.py"), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, timeout=900)
        assert r.returncode == 0, r.stdout[-4000:]
        res = json.load(open(out))
        np.testing.assert_allclose(res["pp_loss"], res["flat_loss"],
                                   rtol=2e-3)
        np.testing.assert_allclose(res["ms_loss"], res["flat_ms_loss"],
                                   rtol=1e-4)
        assert res["pp_gnorm"] > 0
