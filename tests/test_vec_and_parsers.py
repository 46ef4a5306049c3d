"""Unit tests: component-major vec ops and the usda tokenizer edge cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from strelka_tpu.loaders.usda_parser import parse_usda
from strelka_tpu.ops import vec as V


def _rand_vec(n, rng):
    return V.from_rows(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)))


def test_vec_algebra_matches_numpy():
    rng = np.random.default_rng(0)
    a_np = rng.normal(size=(64, 3)).astype(np.float32)
    b_np = rng.normal(size=(64, 3)).astype(np.float32)
    a = V.from_rows(jnp.asarray(a_np))
    b = V.from_rows(jnp.asarray(b_np))
    np.testing.assert_allclose(np.asarray(V.to_rows(a + b)), a_np + b_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(V.to_rows(a - b)), a_np - b_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(V.to_rows(a * 2.0)), a_np * 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(V.to_rows(1.0 - a)), 1 - a_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(V.dot(a, b)), (a_np * b_np).sum(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(V.to_rows(V.cross(a, b))), np.cross(a_np, b_np), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(V.length(a)), np.linalg.norm(a_np, axis=-1), rtol=1e-5)
    n = np.asarray(V.to_rows(V.normalize(a)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(V.vmax(a)), a_np.max(-1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(V.luminance(a)), a_np @ np.array([0.299, 0.587, 0.114], np.float32), rtol=1e-5
    )


def test_vec_gather_rows():
    rng = np.random.default_rng(1)
    table = rng.normal(size=(50, 3)).astype(np.float32)
    idx = rng.integers(0, 50, 128)
    got = np.asarray(V.to_rows(V.gather_rows(jnp.asarray(table), jnp.asarray(idx))))
    np.testing.assert_array_equal(got, table[idx])


def test_vec_matvec():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(4, 4)).astype(np.float32)
    v_np = rng.normal(size=(16, 3)).astype(np.float32)
    v = V.from_rows(jnp.asarray(v_np))
    # direction (w=0)
    got = np.asarray(V.to_rows(V.matvec(jnp.asarray(m), v)))
    want = v_np @ m[:3, :3].T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # point (w=1)
    got_p = np.asarray(V.to_rows(V.matvec(jnp.asarray(m), v, w=1.0)))
    np.testing.assert_allclose(got_p, want + m[:3, 3], rtol=1e-5, atol=1e-5)


def test_usda_parser_edges():
    doc = parse_usda('''#usda 1.0
(
    defaultPrim = "A"
)
def Xform "A"
{
    custom uniform float myattr = 2.5
    float3 xformOp:translate = (1, 2, 3)
    matrix4d xformOp:transform = ( (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (5, 6, 7, 1) )
    rel material:binding = </B/mat>
    asset inputs:file = @tex/foo.png@
    int[] empty = []
    string note = "hello \\"quoted\\""
    token t = "x"
    bool flag = false
    def "Untyped" {}
    over Xform "Child"
    {
        double radius = 1e-3
    }
}
''')
    a = doc.find("/A")
    assert a.attrs["myattr"].value == pytest.approx(2.5)
    assert a.attrs["myattr"].uniform
    assert a.attrs["xformOp:translate"].value == (1, 2, 3)
    m = a.attrs["xformOp:transform"].value
    assert m[3] == (5, 6, 7, 1)
    assert a.attrs["material:binding"].targets == ["/B/mat"]
    assert a.attrs["inputs:file"].value == ("__asset__", "tex/foo.png")
    assert a.attrs["empty"].value == []
    assert a.attrs["flag"].value is False
    child = doc.find("/A/Child")
    assert child.specifier == "over"
    assert child.attrs["radius"].value == pytest.approx(1e-3)
    untyped = doc.find("/A/Untyped")
    assert untyped is not None and untyped.type == ""


def test_usda_parser_rejects_non_usda():
    with pytest.raises(ValueError):
        parse_usda("not a usd file")


def test_usda_parser_mutation_fuzz():
    """Robust ingestion contract for the text parser: single-char mutations
    of a real stage either parse or raise SyntaxError — never hang (the
    tuple/list/prim-body loops must reject EOF instead of spinning) and
    never raise another exception type."""
    import os

    import numpy as np

    from strelka_tpu.loaders.usda_parser import parse_usda

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "scenes", "coffeetable.usda",
    )
    src = open(path).read()
    rng = np.random.default_rng(11)
    for _ in range(60):
        i = int(rng.integers(0, len(src)))
        ch = chr(int(rng.integers(32, 127)))
        try:
            parse_usda(src[:i] + ch + src[i + 1 :])
        except SyntaxError:
            pass
