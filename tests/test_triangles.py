import numpy as np
import pandas as pd
import pytest

from graphx_ray.pipelines.triangles import triangle_count
from oracles import fixture_graphs, triangles_oracle

FIX = fixture_graphs()


@pytest.mark.parametrize("name", list(FIX.keys()))
def test_triangles_match_oracle(name):
    edges, verts = FIX[name]
    vdf = pd.DataFrame({"vid": verts.astype(np.int64)})
    got = (
        triangle_count(edges, vertices=vdf, num_parts=3)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    want = triangles_oracle(edges, verts)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_k6_counts():
    edges, verts = FIX["two_cliques_bridge"]
    got = triangle_count(edges, num_parts=2).to_pandas().set_index("vid")["count"]
    # every K6 vertex is in C(5,2)=10 triangles
    for v in [0, 1, 2, 3, 4, 11, 12]:
        assert got[v] == 10
