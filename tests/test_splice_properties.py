"""Property tests for the static splice planner (models/splice.py) — the
heart of the TPU-first design (replaces llava_arch.py:336-836's dynamic
per-sample splicing). Randomized inputs, structural invariants:

  * kind/ids/labels/position layout laws on the full plan
  * mrope newline rule ((0,0,0) every grid_side+1-th vision slot,
    llava_arch.py:725-727) and voxel passthrough
  * truncation and overflow behavior
  * suffix slices agree with the full plan element-for-element
"""

import numpy as np

from video3d_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video3d_tpu.models.splice import (KIND_PAD, KIND_TEXT, KIND_VISION,
                                       build_splice_plan, slice_suffix_plan,
                                       vision_end)

G = 4                       # grid side
T = G * (G + 1)             # tokens per frame (G rows of G patches + \n)


def _random_case(rng, with_image=True, V=None, n_pre=None, n_post=None):
    V = int(rng.integers(1, 4)) if V is None else V
    n_pre = int(rng.integers(0, 12)) if n_pre is None else n_pre
    n_post = int(rng.integers(1, 24)) if n_post is None else n_post
    pre = rng.integers(10, 400, n_pre).tolist()
    post = rng.integers(10, 400, n_post).tolist()
    ids = pre + ([IMAGE_TOKEN_INDEX] if with_image else []) + post
    n_ans = min(3, n_post)       # answer tail must stay inside the post
    labels = [IGNORE_INDEX] * (len(ids) - n_ans) + ids[-n_ans:]
    coords = rng.integers(0, 300, (V, G, G, 3)).astype(np.int64)
    return ids, labels, V, coords, n_pre


class TestPlanInvariants:
    def test_layout_laws(self):
        rng = np.random.default_rng(0)
        for trial in range(25):
            ids, labels, V, coords, n_pre = _random_case(rng)
            L = 256
            plan = build_splice_plan([ids], [labels], [V],
                                     tokens_per_frame=T, max_len=L,
                                     grid_side=G, mrope_coords=[coords])
            n = int(plan.seq_len[0])
            assert n == len(ids) - 1 + V * T
            k = plan.kind[0]
            # pad tail exactly
            assert (k[n:] == KIND_PAD).all() and (k[:n] != KIND_PAD).all()
            # one contiguous vision block of exactly V*T slots
            vis = np.nonzero(k == KIND_VISION)[0]
            assert len(vis) == V * T
            assert vis[0] == n_pre and vis[-1] == n_pre + V * T - 1
            assert vision_end(plan) == n_pre + V * T
            # vision_index counts 0..V*T-1 in order
            assert (plan.vision_index[0, vis] == np.arange(V * T)).all()
            # text ids survive around the block, in order
            spliced = np.concatenate([
                plan.text_ids[0, :n_pre],
                plan.text_ids[0, n_pre + V * T:n]])
            want = [t for t in ids if t != IMAGE_TOKEN_INDEX]
            assert spliced.tolist() == want
            # labels: vision + prompt masked; the answer tail survives
            assert (plan.labels[0, vis] == IGNORE_INDEX).all()
            n_ans = min(3, len(ids) - 1 - n_pre)
            assert plan.labels[0, n - n_ans:n].tolist() == ids[-n_ans:]
            # positions are the identity over the whole row (KV slot law)
            assert (plan.position_ids[0] == np.arange(L)).all()
            # mrope: text tokens count 0,1,2,... skipping the vision block
            m = plan.mrope_position_ids[0]
            assert (m[:n_pre, 0] == np.arange(n_pre)).all()
            tail = np.arange(n - n_pre - V * T) + n_pre + V * T
            assert (m[n_pre + V * T:n, 0] == tail).all()
            # newline rule: every (G+1)-th vision slot is (0,0,0); patch
            # slots carry the voxel coords frame-major row-major
            mv = m[vis].reshape(V, G + 1, G, 3)  # wrong shape on purpose?
            mv = m[vis].reshape(V, T // (G + 1), G + 1, 3)
            assert (mv[:, :, G] == 0).all()
            assert (mv[:, :, :G] == coords).all()

    def test_no_image_sentinel_plain_text(self):
        rng = np.random.default_rng(1)
        ids = rng.integers(10, 400, 9).tolist()
        plan = build_splice_plan([ids], None, [2], tokens_per_frame=T,
                                 max_len=32, grid_side=G)
        assert int(plan.seq_len[0]) == len(ids)
        assert (plan.kind[0, :len(ids)] == KIND_TEXT).all()

    def test_truncation_and_overflow(self):
        rng = np.random.default_rng(2)
        ids, labels, V, coords, n_pre = _random_case(rng, V=3, n_pre=4,
                                                     n_post=20)
        full = 4 + 3 * T + 20
        # truncate_to cuts the spliced stream before padding
        plan = build_splice_plan([ids], [labels], [V], tokens_per_frame=T,
                                 max_len=256, grid_side=G,
                                 mrope_coords=[coords],
                                 truncate_to=full - 7)
        assert int(plan.seq_len[0]) == full - 7
        # max_len caps the materialized row
        plan2 = build_splice_plan([ids], [labels], [V], tokens_per_frame=T,
                                  max_len=full - 11, grid_side=G,
                                  mrope_coords=[coords])
        assert int(plan2.seq_len[0]) == full - 11
        assert plan2.text_ids.shape[1] == full - 11

    def test_coord_mask(self):
        ids = [10, 11, IMAGE_TOKEN_INDEX, 55, 12, 55]
        plan = build_splice_plan([ids], None, [1], tokens_per_frame=T,
                                 max_len=64, grid_side=G,
                                 coord_token_id=55)
        n = int(plan.seq_len[0])
        hits = np.nonzero(plan.coord_mask[0])[0]
        assert len(hits) == 2
        assert (plan.text_ids[0, hits] == 55).all()
        assert (plan.kind[0, hits] == KIND_TEXT).all()
        assert plan.coord_mask[0, n:].sum() == 0


class TestSuffixSliceProperties:
    def test_slice_matches_full_plan(self):
        rng = np.random.default_rng(3)
        for trial in range(25):
            ids, labels, V, coords, n_pre = _random_case(rng)
            L = 256
            plan = build_splice_plan([ids], [labels], [V],
                                     tokens_per_frame=T, max_len=L,
                                     grid_side=G, mrope_coords=[coords])
            P = vision_end(plan)
            n = int(plan.seq_len[0])
            Ls = 64
            suf = slice_suffix_plan(plan, P, Ls)
            assert suf is not None
            assert int(suf.seq_len[0]) == n          # TOTAL length kept
            m = min(Ls, L - P)
            for name in ("text_ids", "kind", "vision_index", "labels",
                         "position_ids", "mrope_position_ids",
                         "coord_mask"):
                a = getattr(plan, name)[0, P:P + m]
                b = getattr(suf, name)[0, :m]
                assert np.array_equal(a, b), name
            # pad positions keep increasing past the copied window
            assert (np.diff(suf.position_ids[0]) == 1).all()
            assert (suf.kind[0, n - P:] == KIND_PAD).all()

    def test_slice_refusals(self):
        rng = np.random.default_rng(4)
        ids, labels, V, coords, _ = _random_case(rng, V=2, n_pre=2,
                                                 n_post=10)
        plan = build_splice_plan([ids], [labels], [V], tokens_per_frame=T,
                                 max_len=256, grid_side=G,
                                 mrope_coords=[coords])
        P = vision_end(plan)
        n = int(plan.seq_len[0])
        # suffix longer than the bucket -> None
        assert slice_suffix_plan(plan, P, (n - P) - 1) is None
        # prefix at/after the true end -> None
        assert slice_suffix_plan(plan, n, 64) is None
        # cutting into the vision block -> None
        assert slice_suffix_plan(plan, P - 1, 64) is None
