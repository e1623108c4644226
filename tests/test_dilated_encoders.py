"""make_dilated parity: get_encoder(output_stride=16|8) across families.

The reference exposes dilated encoders through
`get_encoder(..., output_stride=...)` → `EncoderMixin.make_dilated`
(encoders/__init__.py:46-82, _base.py:35-53): output stride 16 patches
stage 5 (every conv: stride 1, dilation 2), output stride 8 patches
stages 4 and 5 with rates 2 and 4 (_utils.py:48-60). Families whose
downsampling is pooling-based raise ValueError instead
(vgg/densenet/inception*/xception/res2net/resnest).

The numerical mechanism (patched convs on translated weights) is pinned by
tests/test_zoo_parity.py::test_deeplabv3plus_matches_vendored_smp; these
tests pin the stride/channel contract and the stage-isolation invariant
(dilation must not perturb the untouched lower stages) for every family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.models.encoders import get_encoder, stage_dilation

pytestmark = pytest.mark.slow

# one representative per dilatable family (smp support matrix)
DILATABLE = [
    "resnet18",            # BasicBlock resnet
    "resnet50",            # Bottleneck resnet
    "resnext50_32x4d",     # ResNeXt
    "se_resnet50",         # senet family (pretrainedmodels)
    "senet154",            # senet154 stem + 3x3 downsample convs
    "dpn68",               # dual-path
    "mobilenet_v2",
    "efficientnet-b0",
    "timm-efficientnet-b0",
    "timm-tf_efficientnet_lite0",
    "timm-regnetx_002",
    "timm-regnety_002",
    "timm-skresnet18",
    "timm-skresnext50_32x4d",
    "timm-gernet_s",
    "timm-mobilenetv3_large_100",
    "timm-mobilenetv3_small_100",
]

# families whose make_dilated raises in the reference
NOT_DILATABLE = [
    "vgg11", "densenet121", "inceptionv4", "inceptionresnetv2", "xception",
    "timm-res2net50_26w_4s", "timm-resnest14d",
]


def _pyramid(name, output_stride, hw=64):
    enc = get_encoder(name, depth=5, output_stride=output_stride)
    x = jnp.asarray(np.random.RandomState(0).rand(1, hw, hw, 3),
                    jnp.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, False)
    return enc.apply(variables, x, False)


@pytest.mark.parametrize("name", DILATABLE)
def test_dilated_pyramid_strides(name):
    hw = 64
    f32 = _pyramid(name, 32, hw)
    f16 = _pyramid(name, 16, hw)
    f8 = _pyramid(name, 8, hw)
    # channels unchanged by dilation; strides capped at the output stride
    for level in range(6):
        assert f16[level].shape[-1] == f32[level].shape[-1]
        assert f8[level].shape[-1] == f32[level].shape[-1]
        stride = 2 ** level
        assert f32[level].shape[1] == hw // stride
        assert f16[level].shape[1] == hw // min(stride, 16), (name, level)
        assert f8[level].shape[1] == hw // min(stride, 8), (name, level)


@pytest.mark.parametrize("name", DILATABLE)
def test_dilation_leaves_lower_stages_untouched(name):
    """make_dilated patches ONLY stages 4/5; with identical init params the
    lower-stage features must be bit-identical across output strides."""
    hw = 64
    f32 = _pyramid(name, 32, hw)
    f16 = _pyramid(name, 16, hw)
    f8 = _pyramid(name, 8, hw)
    for level in range(5):  # stages 0..4 identical for os=16
        np.testing.assert_array_equal(np.asarray(f32[level]),
                                      np.asarray(f16[level]))
    for level in range(4):  # stages 0..3 identical for os=8
        np.testing.assert_array_equal(np.asarray(f32[level]),
                                      np.asarray(f8[level]))


@pytest.mark.parametrize("name", NOT_DILATABLE)
def test_undilatable_families_raise(name):
    with pytest.raises(ValueError, match="dilated mode"):
        get_encoder(name, output_stride=16)
    # output_stride=32 still builds fine
    get_encoder(name, output_stride=32)


def test_invalid_output_stride_rejected():
    with pytest.raises(ValueError, match="Output stride should be 16 or 8"):
        get_encoder("resnet18", output_stride=4)
    with pytest.raises(ValueError, match="Output stride should be 16 or 8"):
        stage_dilation(5, 12)


def test_stage_dilation_table():
    assert [stage_dilation(s, 32) for s in range(1, 6)] == [1, 1, 1, 1, 1]
    assert [stage_dilation(s, 16) for s in range(1, 6)] == [1, 1, 1, 1, 2]
    assert [stage_dilation(s, 8) for s in range(1, 6)] == [1, 1, 1, 2, 4]


def test_deeplabv3plus_runs_family_encoder():
    """DeepLabV3+ composes with any dilatable encoder at os=16 and os=8
    (reference deeplabv3/model.py:128-141 + make_dilated)."""
    from senas_tpu.models.zoo import DeepLabV3Plus

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for enc_name, os_ in (("se_resnet50", 16), ("resnet18", 8),
                          ("mobilenet_v2", 16)):
        model = DeepLabV3Plus(classes=2, encoder_name=enc_name,
                              output_stride=os_)
        out, _ = model.init_with_output(
            {"params": jax.random.PRNGKey(0)}, x, False)
        assert out[-1].shape == (1, 64, 64, 2), (enc_name, os_)


def test_deeplabv3plus_invalid_output_stride():
    from senas_tpu.models.zoo import DeepLabV3Plus

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="should be 8 or 16"):
        DeepLabV3Plus(classes=2, output_stride=32).init(
            {"params": jax.random.PRNGKey(0)}, x, False)


def test_pan_output_stride_contract():
    from senas_tpu.models.zoo import PAN

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="PAN support output stride"):
        PAN(classes=2, encoder_output_stride=8).init(
            {"params": jax.random.PRNGKey(0)}, x, False)
    # os=32 is the other legal PAN setting (pan/model.py:59-60); FPA's
    # pooling pyramid needs a bottom feature of at least 8x8 -> 256px input
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    out, _ = PAN(classes=2, encoder_output_stride=32).init_with_output(
        {"params": jax.random.PRNGKey(0)}, x, False)
    assert out[-1].shape == (1, 256, 256, 2)
