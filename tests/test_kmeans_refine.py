"""Lloyd refinement of IVF seeds: inertia decreases monotonically and
assignment machinery is unchanged (same ids, same GEMM path)."""
from spatial4n_spark.operators.similarity import (ivf_inertia, ivf_seeds,
                                                  kmeans_refine)


def test_kmeans_refine_improves_inertia(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    seeds0 = ivf_seeds(emb, k=16)
    i0 = ivf_inertia(emb, seeds0)
    seeds1 = kmeans_refine(emb, seeds0, iters=1)
    i1 = ivf_inertia(emb, seeds1)
    seeds2 = kmeans_refine(emb, seeds1, iters=1)
    i2 = ivf_inertia(emb, seeds2)
    assert i1 < i0, (i0, i1)
    assert i2 <= i1 + 1e-12, (i1, i2)
    # centroid identity preserved for the probe machinery
    assert [c for c, _ in seeds2] == [c for c, _ in seeds0]
    # centroids actually moved and have the right dimensionality
    assert len(seeds2[0][1]) == len(seeds0[0][1])
    assert seeds2[0][1] != seeds0[0][1]
