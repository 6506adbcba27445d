"""DDETR transformer tests: encoder parity vs HF, forward contract,
box-refinement chaining, loss sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from groma_tpu.config import DDETRConfig
from groma_tpu.models.ddetr import (DDETRTransformer, EncoderLayer,
                                    encoder_reference_points)
from groma_tpu.models.ddetr_loss import ddetr_loss
from groma_tpu.models.layers import sine_position_embedding_2d
import pytest
from groma_tpu.checkpoint.hf_import import (import_ddetr_transformer,
                                            to_numpy_state_dict, _msda, _ln,
                                            _dense)

CFG = DDETRConfig(d_model=32, num_queries=12, encoder_layers=2,
                  decoder_layers=2, num_heads=4, ffn_dim=64,
                  num_feature_levels=2, enc_n_points=3, dec_n_points=3,
                  num_labels=1, dropout=0.0)

SHAPES = ((8, 8), (4, 4))


def _hf_encoder():
    from transformers import DeformableDetrConfig
    from transformers.models.deformable_detr.modeling_deformable_detr import (
        DeformableDetrEncoder)
    tcfg = DeformableDetrConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_feature_levels=2, encoder_n_points=3,
        dropout=0.0, activation_dropout=0.0, activation_function='relu')
    torch.manual_seed(1)
    enc = DeformableDetrEncoder(tcfg).eval()
    return enc


@pytest.mark.slow
def test_encoder_matches_hf(rng):
    enc = _hf_encoder()
    sd = to_numpy_state_dict(enc)
    b, s, d = 2, sum(h * w for h, w in SHAPES), 32
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    pos = rng.standard_normal((b, s, d)).astype(np.float32)

    shapes_t = torch.tensor(SHAPES)
    lsi = torch.tensor([0, SHAPES[0][0] * SHAPES[0][1]])
    vr = torch.ones((b, 2, 2))
    with torch.no_grad():
        want = enc(inputs_embeds=torch.from_numpy(x),
                   attention_mask=torch.ones(b, s, dtype=torch.bool),
                   position_embeddings=torch.from_numpy(pos),
                   spatial_shapes=shapes_t, spatial_shapes_list=SHAPES,
                   level_start_index=lsi, valid_ratios=vr,
                   return_dict=True).last_hidden_state.numpy()

    # run my encoder stack with imported weights
    params = {}
    for i in range(2):
        p = f'layers.{i}.'
        params[f'enc_{i}'] = {
            'self_attn': _msda(sd, p + 'self_attn.'),
            'self_attn_layer_norm': _ln(sd, p + 'self_attn_layer_norm'),
            'fc1': _dense(sd, p + 'fc1'),
            'fc2': _dense(sd, p + 'fc2'),
            'final_layer_norm': _ln(sd, p + 'final_layer_norm'),
        }
    ref = jnp.broadcast_to(encoder_reference_points(SHAPES)[None],
                           (b, s, 2, 2))
    h = jnp.asarray(x)
    for i in range(2):
        layer = EncoderLayer(CFG)
        h = layer.apply({'params': params[f'enc_{i}']}, h, jnp.asarray(pos),
                        ref, SHAPES)
    np.testing.assert_allclose(np.asarray(h), want, atol=2e-5)


def _init_transformer(rng):
    model = DDETRTransformer(CFG)
    srcs = [jnp.asarray(rng.standard_normal((2, h, w, 32)), jnp.float32)
            for h, w in SHAPES]
    params = model.init(jax.random.PRNGKey(0), srcs)['params']
    return model, params, srcs


def test_transformer_forward_contract(rng):
    model, params, srcs = _init_transformer(rng)
    out = model.apply({'params': params}, srcs)
    q = CFG.num_queries
    assert out['pred_boxes'].shape == (2, q, 4)
    assert out['logits']['coco'].shape == (2, q, 1)
    assert out['logits']['sa1b'].shape == (2, q, 1)
    assert len(out['aux']['boxes']) == CFG.decoder_layers - 1
    s = sum(h * w for h, w in SHAPES)
    assert out['enc_outputs_class'].shape == (2, s, 1)
    boxes = np.asarray(out['pred_boxes'])
    assert (boxes >= 0).all() and (boxes <= 1).all()
    assert np.isfinite(np.asarray(out['logits']['coco'])).all()


def test_box_refinement_chaining(rng):
    """Level-0 aux boxes must equal the first intermediate reference points
    (the reference's recompute-from-init chaining,
    reference: ddetr_transformer.py:696-711 vs :150-166)."""
    model, params, srcs = _init_transformer(rng)
    out = model.apply({'params': params}, srcs)
    np.testing.assert_allclose(
        np.asarray(out['aux']['boxes'][0]),
        np.asarray(out['intermediate_reference_points'][:, 0]), atol=1e-6)


@pytest.mark.slow
def test_ddetr_loss_finite_and_grad(rng):
    model, params, srcs = _init_transformer(rng)
    tmax = 5
    targets = {
        'class_labels': jnp.zeros((2, tmax), jnp.int32),
        'boxes': jnp.asarray(rng.uniform(0.3, 0.6, (2, tmax, 4)),
                             jnp.float32),
        'valid': jnp.asarray([[True] * 3 + [False] * 2,
                              [True] * 5]),
    }
    out = model.apply({'params': params}, srcs)
    losses = ddetr_loss(out, targets, CFG, 'coco')
    assert np.isfinite(float(losses['loss']))
    # expected loss keys: final + aux per extra layer + enc
    for k in ('loss_ce', 'loss_bbox', 'loss_giou', 'loss_ce_0',
              'loss_ce_enc'):
        assert k in losses, losses.keys()

    def loss_fn(p):
        o = model.apply({'params': p}, srcs)
        return ddetr_loss(o, targets, CFG, 'sa1b')['loss']

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # sa1b loss must not touch the coco heads (single-source supervision)
    coco_g = g['class_embed_coco_0']['kernel']
    assert float(jnp.abs(coco_g).max()) == 0.0
