"""Raw dataset parsers on tiny synthetic files (Gowalla TSV, Yelp JSON
stream, Amazon CSV) — reference format semantics (dataset.py:167-255)."""

import json

import numpy as np

from inductive_recommendation_tpu.data import (
    AmazonDataset,
    GowallaDataset,
    YelpDataset,
)


def test_gowalla_parser(tmp_path):
    lines = []
    # user, time, lat, lon, item; 5 items per user so the chronological split
    # has a nonzero test share (int(5*0.2)=1 — avoids the lst[-0:] quirk)
    for u in range(4):
        for j, i in enumerate(range(5)):
            lines.append(f"{u}\t2010-10-1{j}T0{u}:00:00Z\t0.0\t0.0\t{i}")
    lines.append("9\t2010-10-19T01:00:00Z\t0.0\t0.0\t7")  # pruned by k-core
    (tmp_path / "Gowalla_totalCheckins.txt").write_text("\n".join(lines))
    ds = GowallaDataset(
        {
            "name": "GowallaDataset",
            "path": str(tmp_path),
            "min_inter": 2,
            "split_ratio": [0.6, 0.2, 0.2],
        }
    )
    assert ds.n_users == 4 and ds.n_items == 5
    assert len(ds.train_array) > 0
    # chronological split partitions each user's 5 interactions 3/1/1
    for u in range(ds.n_users):
        assert len(ds.train_data[u]) == 3
        assert len(ds.val_data[u]) == 1
        assert len(ds.test_data[u]) == 1


def test_yelp_parser(tmp_path):
    recs = []
    for u in range(3):
        for i in range(3):
            recs.append(
                {
                    "user_id": f"u{u}",
                    "business_id": f"b{i}",
                    "stars": 5.0,
                    "date": f"2015-01-0{i+1} 00:00:0{u}",
                }
            )
    # low-star review must be filtered (stars <= 3)
    recs.append(
        {
            "user_id": "u0",
            "business_id": "b9",
            "stars": 2.0,
            "date": "2015-01-05 00:00:00",
        }
    )
    (tmp_path / "yelp_academic_dataset_review.json").write_text(
        "\n".join(json.dumps(r) for r in recs)
    )
    ds = YelpDataset(
        {
            "name": "YelpDataset",
            "path": str(tmp_path),
            "min_inter": 2,
            "split_ratio": [0.6, 0.2, 0.2],
        }
    )
    assert ds.n_users == 3 and ds.n_items == 3  # b9 filtered by stars


def test_amazon_parser(tmp_path):
    rows = []
    for u in range(3):
        for i in range(3):
            rows.append(f"u{u},asin{i},5.0,{1000 + u * 10 + i}")
    rows.append("u0,asinX,1.0,9999")  # rating <= 3 filtered
    (tmp_path / "ratings_Books.csv").write_text("\n".join(rows))
    ds = AmazonDataset(
        {
            "name": "AmazonDataset",
            "path": str(tmp_path),
            "min_inter": 2,
            "split_ratio": [0.6, 0.2, 0.2],
        }
    )
    assert ds.n_users == 3 and ds.n_items == 3
    arr = np.asarray(ds.train_array)
    assert arr[:, 1].max() < ds.n_items
