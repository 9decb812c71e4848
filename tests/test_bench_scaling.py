"""bench.py --devices machinery rehearsal on the virtual CPU mesh
(VERDICT r4 task 8): a real multi-chip hardware window must need ZERO new
code — both the replicated and ZeRO-1 scaling paths of the bench are
exercised end-to-end here at tiny shapes.  Throughput numbers produced in
this mode are machinery checks, never perf data (8 virtual devices share
4 physical cores)."""

import dataclasses

import pytest


@pytest.mark.parametrize("zero1", [False, True])
def test_bench_scaling_machinery(zero1):
    import bench

    cfg = dataclasses.replace(
        bench.flagship_config(),
        n_rays=64,
        samples_per_ray=8,
        n_candidates=16,
        occ_n_probe=1 << 9,
    )
    cfg = dataclasses.replace(
        cfg,
        field=dataclasses.replace(
            cfg.field,
            grid=dataclasses.replace(
                cfg.field.grid, n_levels=3, log2_hashmap_size=10,
                base_resolution=8,
            ),
            sdf_hidden_dim=16,
            rgb_hidden_dim=16,
        ),
    )
    res = bench.bench_scaling(8, n_iters=2, zero1=zero1, config=cfg)
    # Both mesh sizes ran and produced finite positive rates.
    assert set(res) == {1, 8}
    assert res[1] > 0 and res[8] > 0
