"""HF checkpoint import: torch/safetensors state dicts -> flax param pytrees.

Satisfies the reference's "same HF checkpoint loading" parity surface
(reference: groma/model/groma.py:100-107 from_pretrained composition of
dinov2 / vicuna / ddetr / full-Groma checkpoints).  All conversion is
numpy-side and happens once; TPU-hostile per-step work (position-embedding
interpolation, layout transposes) is folded into the import so the compiled
model never sees it.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


# ------------------------------------------------------------ file loading

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a HF checkpoint directory (safetensors preferred, torch .bin
    fallback) into a flat name->numpy dict."""
    tensors = {}
    st_files = sorted(f for f in os.listdir(path)
                      if f.endswith('.safetensors'))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            tensors.update(load_file(os.path.join(path, f)))
        return tensors
    bin_files = sorted(f for f in os.listdir(path) if f.endswith('.bin'))
    if not bin_files:
        raise FileNotFoundError(f'no safetensors/bin weights under {path}')
    import torch
    for f in bin_files:
        sd = torch.load(os.path.join(path, f), map_location='cpu',
                        weights_only=True)
        tensors.update({k: v.float().numpy() if v.dtype == torch.bfloat16
                        else v.numpy() for k, v in sd.items()})
    return tensors


def to_numpy_state_dict(module_or_dict) -> Dict[str, np.ndarray]:
    """Accept a torch nn.Module, a torch state dict, or a numpy dict."""
    if isinstance(module_or_dict, dict):
        out = {}
        for k, v in module_or_dict.items():
            out[k] = v if isinstance(v, np.ndarray) else _t2n(v)
        return out
    return {k: _t2n(v) for k, v in module_or_dict.state_dict().items()}


def _t2n(t) -> np.ndarray:
    import torch
    if t.dtype == torch.bfloat16:
        t = t.float()
    return t.detach().cpu().numpy()


# ---------------------------------------------------- torch-bicubic resize

def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Torch's bicubic convolution kernel (a = -0.75)."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    out[m1] = ((a + 2) * t[m1] - (a + 3)) * t[m1] * t[m1] + 1
    m2 = (t > 1) & (t < 2)
    out[m2] = (((t[m2] - 5) * t[m2] + 8) * t[m2] - 4) * a
    return out


def _resize_axis_bicubic(x: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """Separable torch-style bicubic (align_corners=False, border clamp)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    weights = np.zeros((out_size, 4))
    idx = np.zeros((out_size, 4), np.int64)
    for k in range(4):
        ik = i0 - 1 + k
        weights[:, k] = _cubic_kernel(src - ik)
        idx[:, k] = np.clip(ik, 0, in_size - 1)
    x_moved = np.moveaxis(x, axis, 0)
    out = np.einsum('ok,ok...->o...', weights, x_moved[idx])
    return np.moveaxis(out, 0, axis).astype(x.dtype)


def interpolate_pos_embed(pos: np.ndarray, src_grid: int,
                          dst_grid: int) -> np.ndarray:
    """(1, 1+src², C) -> (1, 1+dst², C), CLS slot kept, patch grid resized
    with torch-bicubic numerics (matches HF Dinov2Embeddings
    interpolate_pos_encoding, applied once at import instead of per step)."""
    cls_tok, patch = pos[:, :1], pos[:, 1:]
    c = patch.shape[-1]
    grid = patch.reshape(src_grid, src_grid, c)
    grid = _resize_axis_bicubic(grid, dst_grid, 0)
    grid = _resize_axis_bicubic(grid, dst_grid, 1)
    return np.concatenate(
        [cls_tok, grid.reshape(1, dst_grid * dst_grid, c)], axis=1)


# ------------------------------------------------------------------ dinov2

def import_dinov2(sd: Dict[str, np.ndarray], num_layers: int,
                  patch_size: int, deploy_grid: int | None = None) -> dict:
    """HF Dinov2Model state dict -> flax params for models/dinov2.py."""
    sd = dict(sd)
    prefix = ''
    if any(k.startswith('vis_encoder.') for k in sd):
        prefix = 'vis_encoder.'

    def g(name):
        return sd[prefix + name]

    pos = g('embeddings.position_embeddings')
    src_grid = int(round((pos.shape[1] - 1) ** 0.5))
    if deploy_grid is not None and deploy_grid != src_grid:
        pos = interpolate_pos_embed(pos, src_grid, deploy_grid)

    conv_w = g('embeddings.patch_embeddings.projection.weight')  # (C,3,p,p)
    c_out = conv_w.shape[0]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, c_out)

    params = {
        'cls_token': g('embeddings.cls_token'),
        'pos_embed': pos,
        'patch_embed': {
            'kernel': patch_kernel,
            'bias': g('embeddings.patch_embeddings.projection.bias'),
        },
        'norm': {'scale': g('layernorm.weight'), 'bias': g('layernorm.bias')},
    }
    for i in range(num_layers):
        p = f'encoder.layer.{i}.'
        params[f'layer_{i}'] = {
            'norm1': {'scale': g(p + 'norm1.weight'),
                      'bias': g(p + 'norm1.bias')},
            'qkv': {'kernel': np.concatenate(
                        [g(p + 'attention.attention.query.weight').T,
                         g(p + 'attention.attention.key.weight').T,
                         g(p + 'attention.attention.value.weight').T],
                        axis=1),
                    'bias': np.concatenate(
                        [g(p + 'attention.attention.query.bias'),
                         g(p + 'attention.attention.key.bias'),
                         g(p + 'attention.attention.value.bias')])},
            'attn_out': {'kernel': g(p + 'attention.output.dense.weight').T,
                         'bias': g(p + 'attention.output.dense.bias')},
            'layerscale1': g(p + 'layer_scale1.lambda1'),
            'norm2': {'scale': g(p + 'norm2.weight'),
                      'bias': g(p + 'norm2.bias')},
            'fc1': {'kernel': g(p + 'mlp.fc1.weight').T,
                    'bias': g(p + 'mlp.fc1.bias')},
            'fc2': {'kernel': g(p + 'mlp.fc2.weight').T,
                    'bias': g(p + 'mlp.fc2.bias')},
            'layerscale2': g(p + 'layer_scale2.lambda1'),
        }
    return params


# ------------------------------------------------------------------- llama

def import_llama(sd: Dict[str, np.ndarray], num_layers: int,
                 prefix: str = '') -> dict:
    """HF LlamaForCausalLM state dict -> flax params for models/llama.py.

    ``prefix`` handles nesting inside composite checkpoints
    (e.g. 'llm.' inside a full Groma checkpoint,
    reference: groma/model/groma.py:104)."""

    def g(name):
        return sd[prefix + name]

    model = {'norm': {'scale': g('model.norm.weight')}}
    for i in range(num_layers):
        p = f'model.layers.{i}.'
        model[f'layers_{i}'] = {
            'input_layernorm': {'scale': g(p + 'input_layernorm.weight')},
            'post_attention_layernorm': {
                'scale': g(p + 'post_attention_layernorm.weight')},
            'self_attn': {
                'q_proj': {'kernel': g(p + 'self_attn.q_proj.weight').T},
                'k_proj': {'kernel': g(p + 'self_attn.k_proj.weight').T},
                'v_proj': {'kernel': g(p + 'self_attn.v_proj.weight').T},
                'o_proj': {'kernel': g(p + 'self_attn.o_proj.weight').T},
            },
            'gate_proj': {'kernel': g(p + 'mlp.gate_proj.weight').T},
            'up_proj': {'kernel': g(p + 'mlp.up_proj.weight').T},
            'down_proj': {'kernel': g(p + 'mlp.down_proj.weight').T},
        }
    params = {
        'model': model,
        'embed_tokens': g('model.embed_tokens.weight'),
        'lm_head': {'kernel': g('lm_head.weight').T},
    }
    return params


# ------------------------------------------------------------------- ddetr

def _dense(sd, name):
    return {'kernel': sd[name + '.weight'].T, 'bias': sd[name + '.bias']}


def _ln(sd, name):
    return {'scale': sd[name + '.weight'], 'bias': sd[name + '.bias']}


def _conv(sd, name):
    # torch (out, in, kh, kw) -> flax NHWC (kh, kw, in, out)
    return {'kernel': sd[name + '.weight'].transpose(2, 3, 1, 0),
            'bias': sd[name + '.bias']}


def _convt(sd, name):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out);
    # flax ConvTranspose (transpose_kernel=False) applies the kernel as a
    # regular conv in the fractionally-strided formulation, so the spatial
    # taps must be mirrored (verified in tests/test_perceiver.py)
    w = sd[name + '.weight'][:, :, ::-1, ::-1]
    return {'kernel': np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
            'bias': sd[name + '.bias']}


def _msda(sd, p):
    return {
        'value_proj': _dense(sd, p + 'value_proj'),
        'sampling_offsets': _dense(sd, p + 'sampling_offsets'),
        'attention_weights': _dense(sd, p + 'attention_weights'),
        'output_proj': _dense(sd, p + 'output_proj'),
    }


def _mlp3(sd, p):
    return {f'layers_{i}': _dense(sd, f'{p}layers.{i}') for i in range(3)}


def import_ddetr_transformer(sd: Dict[str, np.ndarray], encoder_layers: int,
                             decoder_layers: int, prefix: str = '') -> dict:
    """Reference DeformableDetrTransformer state dict -> flax params for
    models/ddetr.py DDETRTransformer
    (reference naming from groma/model/ddetr_transformer.py:295-359)."""

    def k(name):
        return prefix + name

    s = {key[len(prefix):]: v for key, v in sd.items()
         if key.startswith(prefix)}
    params = {
        'level_embed': s['level_embed'],
        'query_position_embeddings': s['query_position_embeddings.weight'],
        'enc_output': _dense(s, 'enc_output'),
        'enc_output_norm': _ln(s, 'enc_output_norm'),
        'pos_trans': _dense(s, 'pos_trans'),
        'pos_trans_norm': _ln(s, 'pos_trans_norm'),
        'class_embed_enc': _dense(s, 'class_embed_enc'),
    }
    for i in range(encoder_layers):
        p = f'encoder.layers.{i}.'
        params[f'encoder_layers_{i}'] = {
            'self_attn': _msda(s, p + 'self_attn.'),
            'self_attn_layer_norm': _ln(s, p + 'self_attn_layer_norm'),
            'fc1': _dense(s, p + 'fc1'),
            'fc2': _dense(s, p + 'fc2'),
            'final_layer_norm': _ln(s, p + 'final_layer_norm'),
        }
    for i in range(decoder_layers):
        p = f'decoder.layers.{i}.'
        params[f'decoder_layers_{i}'] = {
            'self_attn_q': _dense(s, p + 'self_attn.q_proj'),
            'self_attn_k': _dense(s, p + 'self_attn.k_proj'),
            'self_attn_v': _dense(s, p + 'self_attn.v_proj'),
            'self_attn_out': _dense(s, p + 'self_attn.out_proj'),
            'self_attn_layer_norm': _ln(s, p + 'self_attn_layer_norm'),
            'encoder_attn': _msda(s, p + 'encoder_attn.'),
            'encoder_attn_layer_norm': _ln(s, p + 'encoder_attn_layer_norm'),
            'fc1': _dense(s, p + 'fc1'),
            'fc2': _dense(s, p + 'fc2'),
            'final_layer_norm': _ln(s, p + 'final_layer_norm'),
        }
    for i in range(decoder_layers):
        params[f'class_embed_coco_{i}'] = _dense(s, f'class_embed_coco.{i}')
        params[f'class_embed_sa1b_{i}'] = _dense(s, f'class_embed_sa1b.{i}')
    for i in range(decoder_layers + 1):
        params[f'bbox_embed_{i}'] = _mlp3(s, f'bbox_embed.{i}.')
    return params


def import_input_proj(sd: Dict[str, np.ndarray], num_feature_levels: int,
                      prefix: str = 'input_proj.') -> dict:
    """Reference conv-pyramid Sequential -> flax InputProj params
    (reference: groma/model/ddetr.py:113-152; list is reversed, so flax
    input_proj_0 maps to reference input_proj.0 == recipe nfl-1)."""
    out = {}
    if num_feature_levels == 1:
        out['input_proj_0'] = {'conv0': _conv(sd, prefix + '0.0'),
                               'ln0': _ln(sd, prefix + '0.1')}
        return out
    order = list(range(num_feature_levels))[::-1]
    for i, recipe in enumerate(order):
        p = f'{prefix}{i}.'
        if recipe == 0:
            out[f'input_proj_{i}'] = {'conv0': _conv(sd, p + '0'),
                                      'ln0': _ln(sd, p + '1')}
        elif recipe == 1:
            out[f'input_proj_{i}'] = {'conv0': _conv(sd, p + '0'),
                                      'ln0': _ln(sd, p + '1')}
        elif recipe == 2:
            out[f'input_proj_{i}'] = {
                'convt0': _convt(sd, p + '0'),
                'conv1': _conv(sd, p + '1'),
                'ln0': _ln(sd, p + '2'),
                'conv2': _conv(sd, p + '3'),
            }
        elif recipe == 3:
            out[f'input_proj_{i}'] = {
                'convt0': _convt(sd, p + '0'),
                'ln0': _ln(sd, p + '1'),
                'convt1': _convt(sd, p + '3'),
                'conv1': _conv(sd, p + '4'),
                'ln1': _ln(sd, p + '5'),
                'conv2': _conv(sd, p + '6'),
            }
    return out


def import_perceiver(sd: Dict[str, np.ndarray], vit_layers: int,
                     encoder_layers: int, decoder_layers: int,
                     num_feature_levels: int, patch_size: int = 14,
                     deploy_grid: int | None = None,
                     prefix: str = '') -> dict:
    """Full CustomDDETRModel checkpoint -> flax Perceiver params."""
    s = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {'vis_encoder': import_dinov2(
        s, vit_layers, patch_size, deploy_grid=deploy_grid)}
    params.update(import_input_proj(s, num_feature_levels))
    params['ddetr_transformer'] = import_ddetr_transformer(
        s, encoder_layers, decoder_layers, prefix='ddetr_transformer.')
    return params


# ---------------------------------------------------------- region encoder

def import_region_encoder(sd: Dict[str, np.ndarray], num_levels: int = 3,
                          num_fuse: int = 5, embed_dims: int = 1024,
                          roi_out: int = 14, prefix: str = '') -> dict:
    """Reference MLVLROIQueryModule state dict -> flax RegionEncoder params
    (reference naming from groma/model/roi_align.py:196-326).

    The reference flattens pooled features channel-major (NCHW flatten,
    roi_align.py:318); our NHWC flatten is (y, x, c)-major, so the
    flatten_linear kernel rows are permuted accordingly.
    """
    s = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    fuse = {}
    for lvl in range(num_levels):
        fuse[f'input_conv_{lvl}'] = _conv(s, f'mlvl_fuse.input_conv.{lvl}')
    for i in range(num_fuse):
        fuse[f'fuse_conv_{i}'] = {
            'conv': {'kernel':
                     s[f'mlvl_fuse.fuse_convs.{i}.conv.weight']
                     .transpose(2, 3, 1, 0)},
            'gn': _ln(s, f'mlvl_fuse.fuse_convs.{i}.gn'),
        }
    params = {'mlvl_fuse': fuse}
    for lvl in range(num_levels):
        c = _conv(s, f'roi_align.pconvs.{lvl}')
        params[f'pconv_kernel_{lvl}'] = c['kernel']
        params[f'pconv_bias_{lvl}'] = c['bias']
    params['pos_fc1'] = _dense(s, 'roi_align.pos_embedd.0')
    params['pos_ln1'] = _ln(s, 'roi_align.pos_embedd.2')
    params['pos_fc2'] = _dense(s, 'roi_align.pos_embedd.3')
    params['pos_ln2'] = _ln(s, 'roi_align.pos_embedd.5')
    params['updims'] = _dense(s, 'roi_align.updims')

    w = s['roi_align.flatten_linear.weight']          # (1024, C*H*W) NCHW
    out_dim = w.shape[0]
    w = w.reshape(out_dim, embed_dims, roi_out, roi_out)
    w = w.transpose(0, 2, 3, 1).reshape(out_dim, -1)  # -> (out, H*W*C)
    params['flatten_linear'] = {'kernel': w.T,
                                'bias': s['roi_align.flatten_linear.bias']}
    return params


def load_config_json(path: str) -> dict:
    with open(os.path.join(path, 'config.json')) as f:
        return json.load(f)


# --------------------------------------------- bitsandbytes 4-bit import

def is_bnb_nf4(sd: Dict[str, np.ndarray], name: str) -> bool:
    """True when ``name`` was serialized by a bitsandbytes Linear4bit
    (reference quantization switch: groma/eval/run_groma.py:43-61 with
    BitsAndBytesConfig nf4; bnb 0.43 serializes the packed codes as
    ``<name>`` plus sidecar ``<name>.absmax`` / ``<name>.quant_map`` /
    ``<name>.quant_state.bitsandbytes__nf4`` entries)."""
    return f'{name}.quant_state.bitsandbytes__nf4' in sd \
        or (f'{name}.absmax' in sd and f'{name}.quant_map' in sd)


def import_bnb_nf4_weight(sd: Dict[str, np.ndarray], name: str,
                          shape=None, dtype=np.float32) -> np.ndarray:
    """Dequantize a bnb-nf4 serialized weight back to a dense array.

    Handles the non-double-quant layout: ``<name>`` is the packed uint8
    code tensor (two nibbles/byte, first element in the HIGH nibble —
    bnb pack order), ``<name>.absmax`` the fp32 per-block scales,
    ``<name>.quant_map`` the 16-entry NF4 table.  ``shape`` defaults to
    the value stored in the quant_state blob when parseable, else must
    be passed (torch Linear convention: (out_features, in_features)).
    Double-quantized (nested) absmax is rejected explicitly.
    """
    from groma_tpu.ops.quant4 import NF4_TABLE

    if f'{name}.nested_absmax' in sd:
        raise NotImplementedError(
            'double-quantized (bnb_4bit_use_double_quant) checkpoints are '
            'not supported; re-export with double quant off')
    codes = np.asarray(sd[name]).reshape(-1).astype(np.uint8)
    absmax = np.asarray(sd[f'{name}.absmax']).astype(np.float32).reshape(-1)
    qmap = np.asarray(sd.get(f'{name}.quant_map', NF4_TABLE))
    np.testing.assert_allclose(np.sort(qmap.reshape(-1)),
                               np.sort(NF4_TABLE), atol=1e-6,
                               err_msg='quant_map is not the NF4 table')
    if shape is None:
        qs = sd.get(f'{name}.quant_state.bitsandbytes__nf4')
        if qs is not None:
            meta = json.loads(bytes(np.asarray(qs).astype(np.uint8)))
            shape = tuple(meta['shape'])
        else:
            raise ValueError(f'{name}: no shape in state dict; pass shape=')
    numel = int(np.prod(shape))
    block = numel // absmax.shape[0]
    hi = (codes >> 4) & 0xF
    lo = codes & 0xF
    idx = np.stack([hi, lo], axis=1).reshape(-1)[:numel]
    vals = np.asarray(qmap).reshape(-1)[idx].reshape(-1, block)
    vals = vals * absmax[:, None]
    return vals.reshape(shape).astype(dtype)
