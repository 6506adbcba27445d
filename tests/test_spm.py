"""Pure-python sentencepiece BPE reader tests on a synthetic model."""

from groma_tpu.data.spm import SentencePieceBPE, WS, build_model_proto


def _toy_model():
    # ids: 0 unk, 1 bos, 2 eos, then pieces
    pieces = [('<unk>', 0.0, 2), ('<s>', 0.0, 3), ('</s>', 0.0, 3)]
    # full merge chains (as in real sp models every merge product exists)
    vocab = [WS, 'h', 'e', 'l', 'o', 'w', 'r', 'd',
             WS + 'h', WS + 'he', 'll', WS + 'hell', WS + 'hello',
             WS + 'w', 'or', WS + 'wor', 'ld', WS + 'world']
    # later pieces get higher score so longer merges win
    for i, p in enumerate(vocab):
        pieces.append((p, float(i), 1))
    # byte fallback pieces
    for b in range(256):
        pieces.append((f'<0x{b:02X}>', -100.0, 6))
    return SentencePieceBPE(build_model_proto(pieces))


def test_parse_and_vocab():
    sp = _toy_model()
    assert sp.vocab_size == 3 + 18 + 256
    assert sp.piece_to_id['<unk>'] == 0
    assert sp.unk_id == 0


def test_bpe_merges_longest():
    sp = _toy_model()
    ids = sp.encode('hello world', add_bos=True)
    toks = [sp.pieces[i][0] for i in ids[1:]]
    assert toks == [WS + 'hello', WS + 'world']
    assert ids[0] == 1


def test_byte_fallback_roundtrip():
    sp = _toy_model()
    ids = sp.encode('héllo', add_bos=False)   # é not in vocab -> bytes
    text = sp.decode(ids)
    assert text == 'héllo'


def test_decode_skips_control():
    sp = _toy_model()
    ids = sp.encode('hello', add_bos=True)
    assert sp.decode(ids) == 'hello'


def test_spm_tokenizer_with_protocol_tokens(tmp_path):
    from groma_tpu.data.spm import build_model_proto
    from groma_tpu.data.tokenizer import SPMTokenizer
    from groma_tpu.constants import DEFAULT_TOKENS

    pieces = [('<unk>', 0.0, 2), ('<s>', 0.0, 3), ('</s>', 0.0, 3)]
    from groma_tpu.data.spm import WS
    for i, p in enumerate([WS, 'c', 'a', 't', WS + 'c', WS + 'ca',
                           WS + 'cat']):
        pieces.append((p, float(i), 1))
    for b in range(256):
        pieces.append((f'<0x{b:02X}>', -100.0, 6))
    path = tmp_path / 'tokenizer.model'
    path.write_bytes(build_model_proto(pieces))

    tok = SPMTokenizer(str(path))
    sp = tok.sp
    text = f"cat {DEFAULT_TOKENS['image']} cat {DEFAULT_TOKENS['region']}"
    ids = tok.encode(text)
    assert ids[0] == 1
    assert sp.image in ids and sp.region in ids
    # protocol ids sit above the base vocab in reference order
    assert sp.image >= tok.base_vocab
    round_trip = tok.decode([i for i in ids[1:]])
    assert 'cat' in round_trip and '<image>' in round_trip
