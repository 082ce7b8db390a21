"""FID InceptionV3: output shapes, softmax probs, converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np


def test_inception_activations_shapes():
    from iprgan_tpu.networks.inception import InceptionActivations

    inc = InceptionActivations.build(None)  # random init (no weights file)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)),
                    jnp.float32)
    feats, probs = inc(x)
    assert feats.shape == (2, 2048)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, rtol=1e-4)
    assert np.isfinite(np.asarray(feats)).all()


def test_converter_maps_torch_layout():
    from iprgan_tpu.networks.inception import convert_torch_state_dict

    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones(32, np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones(32, np.float32),
        "Mixed_5b.branch1x1.conv.weight": np.zeros((64, 192, 1, 1),
                                                   np.float32),
        "Mixed_5b.branch1x1.bn.weight": np.ones(64, np.float32),
        "fc.weight": np.zeros((1008, 2048), np.float32),
        "fc.bias": np.zeros(1008, np.float32),
    }
    v = convert_torch_state_dict(sd)
    assert v["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == \
        (3, 3, 3, 32)  # OIHW -> HWIO
    assert v["params"]["Mixed_5b"]["branch1x1"]["conv"]["kernel"].shape == \
        (1, 1, 192, 64)
    assert v["params"]["fc"]["kernel"].shape == (2048, 1008)
    assert v["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)
