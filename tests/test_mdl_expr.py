"""MDL constant-expression interpreter tests (loaders/mdl_expr.py).

Reference capability: the MDL SDK evaluates computed parameter defaults and
nested function calls during class compilation with constant folding
(mdlMaterialCompiler.cpp:93-115); the TPU build folds the same constant
subset onto the uber-BSDF param table at load time."""

import os

import numpy as np
import pytest

from strelka_tpu.loaders import mdl_expr as ME
from strelka_tpu.loaders.mdl import load_mdl_module, parse_mdl_materials

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "materials", "mdl")


def test_eval_arithmetic():
    assert ME.eval_default_text("0.3 + 0.1 * 2.0", {}) == pytest.approx(0.5)
    assert ME.eval_default_text("(1.0 - 0.25) / 0.5", {}) == pytest.approx(1.5)


def test_eval_math_intrinsics():
    assert ME.eval_default_text("math::clamp(2.0 - 1.7, 0.0, 1.0)", {}) == pytest.approx(0.3)
    assert ME.eval_default_text("math::lerp(0.5, 1.5, 0.25)", {}) == pytest.approx(0.75)
    assert ME.eval_default_text("math::max(0.1, math::min(0.9, 2.0))", {}) == pytest.approx(0.9)
    assert ME.eval_default_text("math::saturate(1.7)", {}) == pytest.approx(1.0)
    assert ME.eval_default_text("math::sqrt(0.25)", {}) == pytest.approx(0.5)
    assert ME.eval_default_text("math::luminance(color(1.0, 0.0, 0.0))", {}) == pytest.approx(
        0.212671
    )


def test_eval_color_ops():
    v = ME.eval_default_text("color(0.8, 0.6, 0.4) * 0.75", {})
    assert v == pytest.approx([0.6, 0.45, 0.3])
    v = ME.eval_default_text("math::lerp(color(0.0), color(1.0), 0.5)", {})
    assert v == pytest.approx([0.5, 0.5, 0.5])


def test_eval_param_refs():
    env = {"base": 0.5, "tint": [0.2, 0.4, 0.6]}
    assert ME.eval_default_text("base * 0.5", env) == pytest.approx(0.25)
    assert ME.eval_default_text("tint * base", env) == pytest.approx([0.1, 0.2, 0.3])


def test_eval_non_constant_returns_none():
    assert ME.eval_default_text("state::normal()", {}) is None
    assert ME.eval_default_text("some_unknown_fn(1.0)", {}) is None


def test_parse_functions_expression_and_return_bodies():
    text = """
    export float half_of(float x) = x * 0.5;
    export color warm(float heat = 0.5, color base = color(0.8, 0.6, 0.4))
    {
        return base * math::lerp(0.5, 1.5, heat);
    }
    export float too_complex(float x) { float y = x; return y; }
    """
    funcs = ME.parse_mdl_functions(text)
    assert set(funcs) == {"half_of", "warm"}  # multi-statement body skipped
    assert ME.eval_default_text("half_of(0.5)", {}, funcs) == pytest.approx(0.25)
    # named arg + default arg fill-in
    assert ME.eval_default_text("warm(heat: 0.25)", {}, funcs) == pytest.approx(
        [0.6, 0.45, 0.3]
    )
    # nested calls
    assert ME.eval_default_text("half_of(half_of(1.0))", {}, funcs) == pytest.approx(0.25)


def test_recursion_bound():
    funcs = ME.parse_mdl_functions("export float f(float x) = f(x);")
    assert ME.eval_default_text("f(1.0)", {}, funcs) is None


def test_computed_defaults_resolve_in_module():
    mod = load_mdl_module("computed.mdl", [DATA])
    assert mod is not None
    p = mod.materials["ComputedPBR"]
    assert p["base_rough"] == pytest.approx(0.5)
    assert p["rough"] == pytest.approx(0.25)
    assert np.asarray(p["tint"]) == pytest.approx([0.6, 0.45, 0.3])
    assert p["metal"] == pytest.approx(0.3)


def test_computed_material_matches_hand_folded_twin():
    """VERDICT r4 task 6 'done' bar: the computed-default material compiles
    to the same material row as its hand-folded literal twin."""
    from strelka_tpu.materials import MaterialManager

    mm = MaterialManager()
    mm.add_mdl_search_path(DATA)
    module = mm.create_module("computed.mdl")
    assert module is not None
    rows = []
    for name in ("ComputedPBR", "ComputedPBRFolded"):
        inst = mm.create_material_instance(module, name)
        rows.append(mm.compile_material(inst))
    a, b = rows
    assert a.bsdf_type == b.bsdf_type
    np.testing.assert_allclose(a.diffuse_color, b.diffuse_color, atol=1e-6)
    assert float(a.roughness) == pytest.approx(float(b.roughness), abs=1e-6)
    assert float(a.metallic) == pytest.approx(float(b.metallic), abs=1e-6)


def test_computed_body_df_args_fold():
    """df args that call user functions fold through the same evaluator."""
    text = """
    export float half_of(float x) = x * 0.5;
    export material M(float r = 0.8) = material(
        surface: material_surface(
            scattering: df::microfacet_ggx_smith_bsdf(
                roughness_u: half_of(r), tint: color(0.5))
        )
    );
    """
    bodies = {}
    funcs = ME.parse_mdl_functions(text)
    mats = parse_mdl_materials(text, bodies, funcs=funcs)
    from strelka_tpu.loaders.mdl import fold_material_body

    out = fold_material_body(bodies["M"], mats["M"], funcs=funcs)
    # grough folds alpha=0.4 -> perceptual sqrt(0.4)
    assert out["reflection_roughness_constant"] == pytest.approx(0.4**0.5, abs=1e-6)
