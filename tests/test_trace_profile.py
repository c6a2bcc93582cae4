"""Unit tests for the HLO-parsing half of utils/trace_profile.py (the
machinery behind tools/misc/profile_train_step.py / profile_serve.py)."""

import numpy as np

from yunet_tpu.utils.trace_profile import HloMaps

HLO = """\
HloModule jit_step

%fused_computation.5 (param_0.1: bf16[3,3,1,16]) -> bf16[16,160,160,16] {
  %param_0.1 = bf16[3,3,1,16]{3,2,1,0:T(2,128)(2,1)} parameter(0)
  ROOT %conv_general_dilated.0 = bf16[16,160,160,16]{3,0,2,1:T(8,128)(2,1)} convolution(%param_0.1, %param_0.1), window={size=3x3}, dim_labels=b01f_01io->b01f
}

%fused_reduce.2 (param_0.2: f32[128,640]) -> f32[128] {
  %param_0.2 = f32[128,640]{1,0} parameter(0)
  %c = f32[] constant(0)
  ROOT %r = f32[128]{0} reduce(%param_0.2, %c), dimensions={1}
}

ENTRY %main (x: bf16[16,320,320,3]) -> (bf16[16,160,160,16], f32[128]) {
  %x = bf16[16,320,320,3]{3,2,1,0} parameter(0)
  %copy.9 = bf16[16,320,320,3]{0,3,2,1:T(8,128)(2,1)} copy(%x)
  %fusion.5 = bf16[16,160,160,16]{3,0,2,1:T(8,128)(2,1)} fusion(%x), kind=kOutput, calls=%fused_computation.5
  %wide = f32[128,640]{1,0} convert(%x)
  %convert_reduce_fusion = f32[128]{0} fusion(%wide), kind=kInput, calls=%fused_reduce.2
  %nms = f32[1,512]{1,0:T(8,128)} custom-call(%fusion.5), custom_call_target="tpu_custom_call"
  ROOT %t = (bf16[16,160,160,16], f32[128]) tuple(%fusion.5, %convert_reduce_fusion)
}
"""


def test_hlomaps_categorize_and_bytes():
    maps = HloMaps(HLO)
    assert maps.categorize("fusion.5") == "conv fusion"
    assert maps.categorize("convert_reduce_fusion") == "reduce fusion"
    assert maps.categorize("copy.9") == "copy/layout"
    assert maps.categorize("nms") == "pallas/custom-call"
    assert maps.categorize("somethingelse.3") == "other"
    # result bytes from the HLO result type (bf16 = 2 bytes)
    assert maps.inst_bytes["fusion.5"] == 16 * 160 * 160 * 16 * 2
    assert maps.inst_bytes["convert_reduce_fusion"] == 128 * 4
    assert maps.inst_bytes["copy.9"] == 16 * 320 * 320 * 3 * 2


def test_hlomaps_on_real_compiled_program():
    """Parse an actual XLA:CPU-compiled HLO: a conv + reduce program must
    yield at least one conv-categorized and one reduce-categorized
    instruction with plausible byte counts."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO",
                                                     "NHWC"))
        return jnp.maximum(y, 0).sum(axis=(1, 2))

    x = jnp.zeros((2, 16, 16, 8), jnp.float32)
    w = jnp.zeros((3, 3, 8, 8), jnp.float32)
    maps = HloMaps(f.lower(x, w).compile().as_text())
    cats = set()
    for name in list(maps.inst_op) + list(maps.inst_comp):
        cats.add(maps.categorize(name))
    assert any("conv" in c for c in cats), cats
    assert maps.inst_bytes  # result shapes parsed
