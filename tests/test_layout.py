"""Z-order layout: Morton kernel, zone maps, pruning property."""

import numpy as np
import pyarrow as pa

import ray

from relation_extraction_ray.functions.layout import (
    morton_interleave,
    zonemap_prune_fraction,
    zorder_key,
    zorder_zonemaps,
)


def test_morton_interleave_handcrafted():
    x = np.array([0b0, 0b1, 0b11, 0b10, 0xFFFF], dtype=np.uint64)
    y = np.array([0b0, 0b0, 0b00, 0b11, 0xFFFF], dtype=np.uint64)
    z = morton_interleave(x, y)
    # x bits on even positions, y on odd
    assert z.tolist() == [
        0,
        0b1,
        0b0101,
        0b1110,
        int("1" * 32, 2),
    ]
    # brute-force check on randoms
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1 << 16, 200).astype(np.uint64)
    ys = rng.randint(0, 1 << 16, 200).astype(np.uint64)
    zs = morton_interleave(xs, ys)
    for xi, yi, zi in zip(xs, ys, zs):
        want = sum(
            (((int(xi) >> i) & 1) << (2 * i)) | (((int(yi) >> i) & 1) << (2 * i + 1))
            for i in range(16)
        )
        assert int(zi) == want


def _tab(n=20000, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "x": rng.randint(0, 1000, n).astype(np.int64),
            "y": rng.randint(0, 1000, n).astype(np.int64),
        }
    )


def test_zonemaps_block_invariant_and_consistent(ray_session):
    tab = _tab(5000)
    a = zorder_zonemaps(ray.data.from_arrow(tab), "x", "y").to_pandas()
    b = zorder_zonemaps(
        ray.data.from_arrow(tab).repartition(13), "x", "y"
    ).to_pandas()
    assert a.equals(b)
    assert a["n"].sum() == 5000
    # zone maps really bound their buckets: recompute from the keyed rows
    keyed = zorder_key(ray.data.from_arrow(tab), "x", "y").to_pandas()
    want = (
        keyed.groupby("bucket")
        .agg(
            n=("x", "size"),
            min_x=("x", "min"),
            max_x=("x", "max"),
            min_y=("y", "min"),
            max_y=("y", "max"),
        )
        .reset_index()
    )
    assert a.sort_values("bucket").reset_index(drop=True).equals(
        want.sort_values("bucket").reset_index(drop=True)
    )


def test_zorder_prunes_2d_boxes_row_order_cannot(ray_session):
    """The point of the layout: on independent uniform (x, y), a 10 %×10 %
    box query touches nearly every row-order bucket but only a corner of
    the z-ordered ones."""
    tab = _tab(20000)
    zmaps = zorder_zonemaps(ray.data.from_arrow(tab), "x", "y").to_pandas()

    # row-order layout: same bucket COUNT, buckets = arrival order
    df = tab.to_pandas()
    df["bucket"] = np.arange(len(df)) // (len(df) // 64)
    row_maps = (
        df.groupby("bucket")
        .agg(min_x=("x", "min"), max_x=("x", "max"), min_y=("y", "min"), max_y=("y", "max"))
        .reset_index()
        .to_dict("records")
    )

    box = (100, 199, 500, 599)  # 10% × 10%
    frac_z = zonemap_prune_fraction(
        pa.Table.from_pandas(zmaps), box
    )
    frac_row = zonemap_prune_fraction(row_maps, box)
    assert frac_row > 0.9  # row order cannot prune 2-d boxes
    assert frac_z < 0.3
    assert frac_z < frac_row / 2
    # correctness of the pruning contract: every row inside the box lives
    # in a bucket the zone maps keep
    keyed = zorder_key(ray.data.from_arrow(tab), "x", "y").to_pandas()
    a, b, c, d = box
    hit_buckets = {
        r["bucket"]
        for r in zmaps.to_dict("records")
        if r["min_x"] <= b and r["max_x"] >= a and r["min_y"] <= d and r["max_y"] >= c
    }
    inside = keyed[(keyed.x.between(a, b)) & (keyed.y.between(c, d))]
    assert set(inside["bucket"].unique()) <= hit_buckets
