"""Small utility coverage: bucket selection, prefetcher semantics,
checkpoint consolidation."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestBuckets:
    def test_pick_bucket(self):
        from video3d_tpu.eval.drivers import pick_bucket

        assert pick_bucket(100, (128, 256)) == 128
        assert pick_bucket(128, (128, 256)) == 128
        assert pick_bucket(129, (128, 256)) == 256
        assert pick_bucket(9999, (128, 256)) == 256   # clamps to largest


class TestPrefetcher:
    def test_order_and_completion(self):
        from video3d_tpu.train.prefetch import BatchPrefetcher

        class DS:
            def __getitem__(self, i):
                return i

        batches = [[0, 1], [2, 3], [4, 5]]
        pf = BatchPrefetcher(DS(), lambda s: sum(s), batches, depth=2,
                             num_threads=2)
        assert list(pf) == [1, 5, 9]

    def test_error_propagates(self):
        from video3d_tpu.train.prefetch import BatchPrefetcher

        class DS:
            def __getitem__(self, i):
                if i == 2:
                    raise ValueError("boom")
                return i

        pf = BatchPrefetcher(DS(), lambda s: sum(s), [[0], [2]], depth=2,
                             num_threads=1)
        with pytest.raises(ValueError, match="boom"):
            list(pf)


class TestConsolidate:
    def test_roundtrip(self, tmp_path):
        import orbax.checkpoint as ocp

        from video3d_tpu.tools.weight_delta import consolidate

        tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
        src = str(tmp_path / "src")
        ocp.PyTreeCheckpointer().save(src, jax.device_get(tree))
        dst = consolidate(src, str(tmp_path / "dst"))
        back = ocp.PyTreeCheckpointer().restore(dst)
        np.testing.assert_allclose(np.asarray(back["a"]), np.arange(6.0).reshape(2, 3))
        np.testing.assert_allclose(np.asarray(back["b"]["c"]), 1.0)
