"""MovieLens loader tests against synthesized files in the three
standard layouts (no dataset download in this environment)."""

import numpy as np
import pytest

from ncf_tpu.data import movielens


@pytest.fixture
def ml100k_dir(tmp_path):
    d = tmp_path / "ml-100k"
    d.mkdir()
    # u.data: user item rating ts (tab-separated)
    rows = [(1, 10, 4, 100), (2, 20, 3, 50), (1, 20, 5, 200), (3, 10, 2, 150)]
    with open(d / "u.data", "w") as f:
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")
    return str(d)


@pytest.fixture
def ml1m_dir(tmp_path):
    d = tmp_path / "ml-1m"
    d.mkdir()
    with open(d / "ratings.dat", "w") as f:
        f.write("1::10::4::100\n2::20::3::50\n1::20::5::200\n")
    with open(d / "movies.dat", "w", encoding="latin-1") as f:
        f.write("10::Toy Story (1995)::Animation|Children's\n"
                "20::Heat (1995)::Action|Crime\n")
    return str(d)


@pytest.fixture
def ml25m_dir(tmp_path):
    d = tmp_path / "ml-25m"
    d.mkdir()
    with open(d / "ratings.csv", "w") as f:
        f.write("userId,movieId,rating,timestamp\n"
                "1,10,4.0,100\n2,20,3.5,50\n1,20,5.0,200\n")
    with open(d / "movies.csv", "w") as f:
        f.write("movieId,title,genres\n"
                "10,Toy Story (1995),Animation|Children\n"
                "20,Heat (1995),Action|Crime\n")
    return str(d)


class TestLoaders:
    def test_ml100k(self, ml100k_dir):
        assert movielens.available(ml100k_dir)
        inter = movielens.load(ml100k_dir)
        assert inter.num_users == 3 and inter.num_items == 2
        assert len(inter) == 4
        assert (np.diff(inter.timestamps) >= 0).all()  # time-sorted
        # amounts carry ratings
        assert set(inter.amounts.tolist()) == {4.0, 3.0, 5.0, 2.0}

    def test_ml1m_with_genres(self, ml1m_dir):
        inter = movielens.load(ml1m_dir)
        assert inter.num_users == 2 and inter.num_items == 2
        assert inter.item_cat is not None
        # two distinct primary genres -> two categories
        assert inter.num_categories == 2

    def test_ml25m_csv(self, ml25m_dir):
        inter = movielens.load(ml25m_dir)
        assert len(inter) == 3
        assert inter.item_cat is not None

    def test_implicit_threshold(self, ml100k_dir):
        inter = movielens.load(ml100k_dir, implicit_threshold=4.0)
        assert len(inter) == 2  # only ratings >= 4

    def test_missing_dir_raises(self, tmp_path):
        assert not movielens.available(str(tmp_path))
        with pytest.raises(FileNotFoundError):
            movielens.load(str(tmp_path))

    def test_trains_on_ml100k(self, ml100k_dir, tmp_path):
        """A movielens-loaded log flows through the Trainer construction
        (full training is exercised elsewhere; here just the data path)."""
        from ncf_tpu.data import BatchIterator

        inter = movielens.load(ml100k_dir)
        it = BatchIterator(inter, batch_size=4, seed=0)
        batch = next(iter(it.epoch(0)))
        assert batch["user_ids"].shape == (4,)
        assert set(batch) >= {"user_ids", "item_ids", "hour"}
