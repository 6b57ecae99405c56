"""Tests for the data layer: id mapping, splits, popularity, pipeline.

Reference semantics under test: data_prep.py:65-102 (maps + weights),
:77-88 (time split), :397-444 (fixed-size batches).
"""

import numpy as np

from ncf_tpu.data import BatchIterator, Interactions, SECONDS_PER_DAY
from ncf_tpu.data.synthetic import generate_interactions, temporal_features


class TestInteractions:
    def test_from_raw_id_mapping(self):
        raw_u = np.array([10, 99, 10, 50])
        raw_i = np.array(["b", "a", "a", "b"])
        ts = np.array([3, 1, 2, 4])
        inter = Interactions.from_raw(raw_u, raw_i, ts)
        assert inter.num_users == 3 and inter.num_items == 2
        # sorted by timestamp
        assert list(inter.timestamps) == [1, 2, 3, 4]
        # user 99 -> idx 2, item "a" -> 0
        assert inter.user_map[99] == 2
        assert inter.item_map["a"] == 0
        assert inter.user_ids[0] == inter.user_map[99]

    def test_time_split(self):
        n = 100
        ts = np.arange(n) * SECONDS_PER_DAY  # one interaction per day
        inter = Interactions(
            user_ids=np.zeros(n), item_ids=np.zeros(n), timestamps=ts,
            amounts=np.ones(n), num_users=1, num_items=1)
        train, val = inter.time_split(validation_days=10)
        assert len(train) == 90 and len(val) == 10
        assert train.timestamps.max() < val.timestamps.min()

    def test_leave_one_out(self):
        # users 0,1 have >=2 interactions; user 2 has 1 (excluded)
        inter = Interactions(
            user_ids=np.array([0, 1, 0, 1, 2]),
            item_ids=np.array([5, 6, 7, 8, 9]),
            timestamps=np.array([1, 2, 3, 4, 5]),
            amounts=np.ones(5), num_users=3, num_items=10)
        train, eu, ei = inter.leave_one_out()
        assert list(eu) == [0, 1]
        assert list(ei) == [7, 8]  # each user's last interaction
        assert len(train) == 3
        # held-out pairs removed from train
        held = set(zip(eu.tolist(), ei.tolist()))
        assert not held & set(zip(train.user_ids.tolist(), train.item_ids.tolist()))

    def test_inverse_popularity(self):
        inter = Interactions(
            user_ids=np.zeros(6), item_ids=np.array([0, 0, 0, 1, 1, 2]),
            timestamps=np.arange(6), amounts=np.ones(6),
            num_users=1, num_items=4)
        w = inter.inverse_popularity_weights()
        assert abs(w.sum() - 1.0) < 1e-6
        # less popular items get higher weight; unseen items highest
        assert w[3] > w[2] > w[1] > w[0]

    def test_user_histories_csr(self):
        inter = Interactions(
            user_ids=np.array([1, 0, 1, 2]),
            item_ids=np.array([9, 3, 4, 5]),
            timestamps=np.arange(4), amounts=np.ones(4),
            num_users=3, num_items=10)
        offsets, items = inter.user_histories()
        assert list(offsets) == [0, 1, 3, 4]
        assert list(items[1:3]) == [4, 9]  # user 1's items, sorted


class TestSynthetic:
    def test_generator_shapes(self, tiny_interactions):
        inter = tiny_interactions
        assert inter.num_users == 200 and inter.num_items == 64
        assert len(inter) > 200
        assert inter.item_dept is not None and inter.item_cat is not None
        assert inter.item_dept.max() < inter.num_departments
        assert inter.item_cat.max() < inter.num_categories
        assert (np.diff(inter.timestamps) >= 0).all()  # time-sorted

    def test_generator_deterministic(self):
        a = generate_interactions(50, 20, 10, 5, seed=3)
        b = generate_interactions(50, 20, 10, 5, seed=3)
        np.testing.assert_array_equal(a.item_ids, b.item_ids)
        np.testing.assert_array_equal(a.timestamps, b.timestamps)

    def test_temporal_features(self):
        ts = np.array([0, 3600 * 5, SECONDS_PER_DAY + 60, 370 * SECONDS_PER_DAY])
        hour, day, month, doy = temporal_features(ts)
        assert list(hour) == [0, 5, 0, 0]
        assert list(day) == [0, 0, 1, 370 % 7]
        assert list(doy) == [0, 0, 1, 5]  # wraps at 365
        assert (month < 12).all()


class TestBatchIterator:
    def test_fixed_shapes_and_padding(self, tiny_interactions):
        it = BatchIterator(tiny_interactions, batch_size=128, seed=0)
        batches = list(it.epoch(0))
        assert len(batches) == len(it)
        for b in batches:
            assert b["user_ids"].shape == (128,)
            assert set(b) == {"user_ids", "item_ids", "hour", "day",
                              "month", "day_of_year"}

    def test_epoch_shuffle_differs(self, tiny_interactions):
        it = BatchIterator(tiny_interactions, batch_size=64, seed=0)
        b0 = next(iter(it.epoch(0)))
        b1 = next(iter(it.epoch(1)))
        assert not np.array_equal(b0["item_ids"], b1["item_ids"])

    def test_same_epoch_reproducible(self, tiny_interactions):
        it1 = BatchIterator(tiny_interactions, batch_size=64, seed=0)
        it2 = BatchIterator(tiny_interactions, batch_size=64, seed=0)
        np.testing.assert_array_equal(
            next(iter(it1.epoch(4)))["item_ids"],
            next(iter(it2.epoch(4)))["item_ids"])


class TestSortByUser:
    def test_rows_sorted_and_content_preserved(self, tiny_interactions):
        it_sorted = BatchIterator(tiny_interactions, batch_size=64, seed=0)
        it_plain = BatchIterator(tiny_interactions, batch_size=64, seed=0,
                                 sort_by_user=False)
        for bs, bp in zip(it_sorted.epoch(2), it_plain.epoch(2)):
            u = bs["user_ids"]
            assert (np.diff(u.astype(np.int64)) >= 0).all()
            # same multiset of (user, item) rows, just reordered
            rows_s = sorted(zip(bs["user_ids"], bs["item_ids"], bs["hour"]))
            rows_p = sorted(zip(bp["user_ids"], bp["item_ids"], bp["hour"]))
            assert rows_s == rows_p


class TestDeviceEpochPipeline:
    """DeviceEpochPipeline (data/pipeline.py): device-resident epochs must
    match the BatchIterator batch contract — full coverage with repeat
    padding, per-batch user sort, deterministic per (seed, epoch)."""

    def _pipe(self, inter, B, **kw):
        from ncf_tpu.data.pipeline import DeviceEpochPipeline

        return DeviceEpochPipeline(inter, B, seed=3, **kw)

    def test_coverage_and_padding(self, tiny_interactions):
        B = 64
        pipe = self._pipe(tiny_interactions, B)
        n = len(tiny_interactions)
        batches = list(pipe.epoch(0))
        assert len(batches) == -(-n // B)
        seen = np.concatenate(
            [np.asarray(b["item_ids"]) for b in batches])
        assert len(seen) == len(batches) * B
        # every example appears: compare padded multiset minus n extras
        ref = np.sort(tiny_interactions.item_ids)
        got = np.sort(seen)
        # each original item id count is <= got count (padding only adds)
        ref_counts = dict(zip(*np.unique(ref, return_counts=True)))
        got_counts = dict(zip(*np.unique(got, return_counts=True)))
        for k, c in ref_counts.items():
            assert got_counts.get(k, 0) >= c

    def test_sorted_users_per_batch(self, tiny_interactions):
        pipe = self._pipe(tiny_interactions, 64)
        for b in pipe.epoch(1):
            u = np.asarray(b["user_ids"])
            assert (np.diff(u.astype(np.int64)) >= 0).all()

    def test_rows_stay_aligned(self, tiny_interactions):
        """(user, item, hour) triples must come from real examples."""
        rows = set(zip(tiny_interactions.user_ids.tolist(),
                       tiny_interactions.item_ids.tolist()))
        pipe = self._pipe(tiny_interactions, 64)
        for b in pipe.epoch(0):
            for u, i in zip(np.asarray(b["user_ids"]),
                            np.asarray(b["item_ids"])):
                assert (int(u), int(i)) in rows

    def test_deterministic_and_epoch_varies(self, tiny_interactions):
        p1 = self._pipe(tiny_interactions, 64)
        p2 = self._pipe(tiny_interactions, 64)
        a = np.asarray(next(iter(p1.epoch(0)))["item_ids"])
        b = np.asarray(next(iter(p2.epoch(0)))["item_ids"])
        np.testing.assert_array_equal(a, b)
        c = np.asarray(next(iter(p1.epoch(1)))["item_ids"])
        assert not np.array_equal(a, c)

    def test_grouped_dispatch_shapes(self, tiny_interactions):
        pipe = self._pipe(tiny_interactions, 64)
        nb = len(pipe)
        groups = list(pipe.epoch(0, steps_per_dispatch=4))
        lead = [g["user_ids"].shape[0] for g in groups]
        assert sum(lead) == nb
        assert all(x == 4 for x in lead[:-1])
        assert groups[0]["user_ids"].ndim == 2

    def test_epoch_bytes(self, tiny_interactions):
        pipe = self._pipe(tiny_interactions, 64)
        assert pipe.epoch_bytes() == len(pipe) * 64 * 6 * 4  # 6 int32 cols

    def test_trainer_uses_device_pipeline(self, tiny_interactions):
        import jax

        from ncf_tpu.train import Trainer
        from ncf_tpu.utils.config import Config

        cfg = Config()
        cfg.model.mf_dim = cfg.model.mlp_dim = 8
        cfg.model.temporal_dim = 8
        cfg.model.mlp_hidden_dims = [16]
        cfg.model.compute_dtype = "float32"
        cfg.train.batch_size = 64
        cfg.train.num_epochs = 1
        cfg.train.checkpoint_dir = "/tmp/dev_pipe_ck"
        t = Trainer(cfg, tiny_interactions)
        assert t.device_pipeline is not None
        m = t.train_epoch(0)
        assert np.isfinite(m.get("loss", 0.0))
