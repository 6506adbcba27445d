"""Prompt-lookup acceptance on realistic grounded-QA text (round 4).

The hardware bench (bench_spec_decode.py) bounds speculative decoding
with synthetic weights: ceiling (acceptance ~G) and floor (acceptance
0).  What real weights would land BETWEEN those bounds is set entirely
by the TARGET TOKEN STREAM — acceptance depends only on (context,
proposer, emitted tokens), not on the model internals — so it can be
measured exactly by replaying realistic answer streams through the
very proposer the decoder uses (eval/speculative.propose_prompt_lookup)
with the verify loop's exact accounting (n_acc matched + 1 bonus token
per call).

Text families mirror the reference's answer styles:
  * grounded_qa    — questions naming a region phrase, answers echoing
    it ("the man in the red shirt is holding ...") — the motivating
    case (reference: groma/data/datasets/groma.py GPT-4V conversations)
  * grounded_cap   — [grounding] detailed captions with repeated
    <p>phrase</p><roi><rK></roi> markup (reference: flickr.py style)
  * region_cap     — short region captions, low echo (reference:
    refcoco_cap.py / visual_genome.py style)

Tokenization is word+punctuation-level with preserved case: on echoed
spans a subword BPE retokenizes identical text to identical pieces, so
word-level match counts are a faithful proxy for acceptance RATE per
n-gram hit (slightly conservative on run LENGTH: ~1.3 subwords/word
would stretch accepted runs, but also burn draft slots faster).

Combined with hardware costs (t_verify from the floor regime, t_seq
from the sequential scan), mean tokens/call predicts the real-weight
tok/s: tok_s = tokens_per_call / t_verify.

Usage: python benchmarks/exp_spec_acceptance.py [--t-verify-ms X]
       [--t-seq-ms Y]   (defaults from the round-4 on-device run)
"""

import argparse
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groma_tpu.constants import ALL_PROTOCOL_TOKENS  # noqa: E402
from groma_tpu.eval.speculative import propose_prompt_lookup  # noqa: E402

_SPECIAL_RE = re.compile(
    '(' + '|'.join(re.escape(t) for t in
                   sorted(ALL_PROTOCOL_TOKENS, key=len, reverse=True)) + ')')
_WORD_RE = re.compile(r"\w+|[^\w\s]")


def encode(text, vocab):
    """BPE-faithful word/punct tokenization: identical text spans map to
    identical id runs (what matters for lookup), punctuation tokenizes
    separately (as LLaMA BPE does), case is preserved (ditto)."""
    ids = []
    for piece in _SPECIAL_RE.split(text):
        for w in ([piece] if piece in ALL_PROTOCOL_TOKENS
                  else _WORD_RE.findall(piece)):
            ids.append(vocab.setdefault(w, len(vocab)))
    return ids

# ---------------------------------------------------------------- text
# Answers are written in the reference's output grammar.  Echo spans are
# realistic, not adversarial: questions name the region the answer
# discusses, captions reuse the markup skeleton and recurring phrases.

GROUNDED_QA = [
    ("[grounding] What is the man in the red shirt holding?",
     "The man in the red shirt <roi><r3></roi> is holding a wooden "
     "baseball bat <roi><r7></roi> with both hands, ready to swing."),
    ("[grounding] Where is the black dog looking?",
     "The black dog <roi><r1></roi> is looking at the yellow frisbee "
     "<roi><r4></roi> that is flying over the grass field."),
    ("[grounding] What color is the car parked next to the fire hydrant?",
     "The car parked next to the fire hydrant <roi><r2></roi> is a "
     "silver sedan <roi><r0></roi> with tinted windows."),
    ("[grounding] Is the woman on the left wearing a hat?",
     "Yes, the woman on the left <roi><r5></roi> is wearing a wide "
     "brimmed straw hat <roi><r9></roi> that shades her face."),
    ("[grounding] What is on the wooden table near the window?",
     "On the wooden table near the window <roi><r6></roi> there is a "
     "white ceramic vase <roi><r2></roi> holding fresh tulips and a "
     "stack of books <roi><r8></roi> beside it."),
    ("[grounding] What are the two children in the playground doing?",
     "The two children in the playground <roi><r0></roi> <roi><r1></roi> "
     "are climbing the red slide <roi><r4></roi> while a third child "
     "waits at the bottom of the slide."),
]

GROUNDED_CAP = [
    ("[grounding] Describe the image in detail.",
     "The image shows a busy street market. <p>a vendor in a blue "
     "apron</p> <roi><r0></roi> stands behind <p>a wooden stall</p> "
     "<roi><r3></roi> stacked with <p>crates of oranges</p> "
     "<roi><r5></roi> and <p>crates of apples</p> <roi><r6></roi> . "
     "To the right , <p>a woman with a canvas bag</p> <roi><r2></roi> "
     "inspects <p>a pile of tomatoes</p> <roi><r8></roi> while "
     "<p>a small brown dog</p> <roi><r9></roi> sits near <p>the wooden "
     "stall</p> <roi><r3></roi> ."),
    ("[grounding] Describe the image in detail.",
     "A quiet lakeside scene at sunset. <p>a red canoe</p> "
     "<roi><r1></roi> rests on <p>the pebble shore</p> <roi><r4></roi> "
     "next to <p>a weathered wooden dock</p> <roi><r0></roi> . Two "
     "figures , <p>a man in a green jacket</p> <roi><r2></roi> and "
     "<p>a child in a yellow raincoat</p> <roi><r7></roi> , walk along "
     "<p>the weathered wooden dock</p> <roi><r0></roi> toward <p>the "
     "red canoe</p> <roi><r1></roi> ."),
    ("[grounding] Describe what is happening in this picture.",
     "The picture captures a soccer match in progress. <p>a player in "
     "a white kit</p> <roi><r3></roi> dribbles <p>the ball</p> "
     "<roi><r6></roi> past <p>a defender in a dark kit</p> "
     "<roi><r5></roi> while <p>the goalkeeper</p> <roi><r8></roi> "
     "crouches in front of <p>the goal</p> <roi><r9></roi> . Behind "
     "them , <p>a referee in black</p> <roi><r0></roi> keeps pace with "
     "<p>the ball</p> <roi><r6></roi> ."),
    ("[grounding] Describe the image in detail.",
     "An indoor office scene. <p>a developer wearing headphones</p> "
     "<roi><r2></roi> types on <p>a mechanical keyboard</p> "
     "<roi><r4></roi> in front of <p>two large monitors</p> "
     "<roi><r5></roi> . On the desk , <p>a white coffee mug</p> "
     "<roi><r7></roi> sits beside <p>a potted succulent</p> "
     "<roi><r8></roi> , and <p>a gray office chair</p> <roi><r1></roi> "
     "is pushed back from the desk ."),
]

REGION_CAP = [
    ("Describe the region <roi><refer_box></roi> <refer_feat> briefly.",
     "a tabby cat curled up asleep on a striped cushion"),
    ("Describe the region <roi><refer_box></roi> <refer_feat> briefly.",
     "an elderly man reading a newspaper on a park bench"),
    ("Describe the region <roi><refer_box></roi> <refer_feat> briefly.",
     "a stack of blue ceramic bowls on a kitchen shelf"),
    ("Describe the region <roi><refer_box></roi> <refer_feat> briefly.",
     "a rusty bicycle leaning against a brick wall covered in ivy"),
]

#  multi-turn follow-ups: the prior assistant turn sits in the lookup
#  context, and follow-up answers re-list its phrases — the one chat
#  regime where prompt-lookup finds long runs.
MULTI_TURN = [
    ("USER: [grounding] Describe the image in detail. ASSISTANT: "
     "The image shows a busy street market. <p>a vendor in a blue "
     "apron</p> <roi><r0></roi> stands behind <p>a wooden stall</p> "
     "<roi><r3></roi> stacked with <p>crates of oranges</p> "
     "<roi><r5></roi> and <p>crates of apples</p> <roi><r6></roi> . "
     "To the right , <p>a woman with a canvas bag</p> <roi><r2></roi> "
     "inspects <p>a pile of tomatoes</p> <roi><r8></roi> . "
     "USER: Which of those are pieces of fruit?",
     "The pieces of fruit are <p>crates of oranges</p> <roi><r5></roi> "
     "and <p>crates of apples</p> <roi><r6></roi> , while <p>a pile of "
     "tomatoes</p> <roi><r8></roi> is botanically a fruit but sold as "
     "a vegetable ."),
    ("USER: [grounding] Describe what is happening in this picture. "
     "ASSISTANT: The picture captures a soccer match in progress. "
     "<p>a player in a white kit</p> <roi><r3></roi> dribbles <p>the "
     "ball</p> <roi><r6></roi> past <p>a defender in a dark kit</p> "
     "<roi><r5></roi> while <p>the goalkeeper</p> <roi><r8></roi> "
     "crouches in front of <p>the goal</p> <roi><r9></roi> . "
     "USER: Who is closest to the goal?",
     "<p>the goalkeeper</p> <roi><r8></roi> is closest to <p>the "
     "goal</p> <roi><r9></roi> , standing directly in front of it , "
     "followed by <p>a defender in a dark kit</p> <roi><r5></roi> ."),
    ("USER: [grounding] Describe the image in detail. ASSISTANT: "
     "An indoor office scene. <p>a developer wearing headphones</p> "
     "<roi><r2></roi> types on <p>a mechanical keyboard</p> "
     "<roi><r4></roi> in front of <p>two large monitors</p> "
     "<roi><r5></roi> . On the desk , <p>a white coffee mug</p> "
     "<roi><r7></roi> sits beside <p>a potted succulent</p> "
     "<roi><r8></roi> . USER: List the objects on the desk.",
     "The objects on the desk are <p>a mechanical keyboard</p> "
     "<roi><r4></roi> , <p>two large monitors</p> <roi><r5></roi> , "
     "<p>a white coffee mug</p> <roi><r7></roi> and <p>a potted "
     "succulent</p> <roi><r8></roi> ."),
]

FAMILIES = [('grounded_qa', GROUNDED_QA),
            ('grounded_cap', GROUNDED_CAP),
            ('region_cap', REGION_CAP),
            ('multi_turn', MULTI_TURN)]

SYSTEM = ("A chat between a curious user and an artificial intelligence "
          "assistant. The assistant gives helpful, detailed, and polite "
          "answers to the user's questions.")


def simulate(prompt_ids, answer_ids, G, ngram=2):
    """Replay the verify loop's exact accounting against a known target
    stream: each call accepts the longest draft prefix matching the
    stream and emits one bonus token (speculative.py:111-122)."""
    context = list(prompt_ids) + [int(answer_ids[0])]
    out = 1                       # first token comes from prefill argmax
    accepts = []
    while out < len(answer_ids):
        draft = propose_prompt_lookup(context, G, ngram)
        n = 0
        while (n < G and out + n < len(answer_ids)
               and draft[n] == int(answer_ids[out + n])):
            n += 1
        accepts.append(n)
        emit = [int(t) for t in answer_ids[out:out + n + 1]]
        context.extend(emit)
        out += len(emit)
    return accepts


def main():
    ap = argparse.ArgumentParser()
    # round-4 on-device defaults (bench_spec_decode.py, TPU v5e, 7B int8
    # B=1 S~512): floor regime = verify-call rate, sequential scan rate
    ap.add_argument('--t-verify-ms', type=float, default=None,
                    help='measured ms per G+1 verify call (floor regime)')
    ap.add_argument('--t-seq-ms', type=float, default=None,
                    help='measured ms per sequential decode token')
    args = ap.parse_args()

    vocab = {}
    print(f'# {"family":13s} {"G":>2s} {"calls":>5s} {"tok/call":>8s} '
          f'  acceptance histogram 0..G', flush=True)
    results = {}
    for G in (4, 8):
        for fam, pairs in FAMILIES:
            accepts = []
            toks = 0
            for q, a in pairs:
                p_ids = encode(f'{SYSTEM} USER: <image> {q} ASSISTANT:',
                               vocab)
                a_ids = encode(a, vocab)
                acc = simulate(list(p_ids), list(a_ids), G)
                accepts.extend(acc)
                toks += len(a_ids) - 1
            tpc = toks / len(accepts)     # emitted tokens per verify call
            hist = Counter(accepts)
            hstr = ' '.join(f'{k}:{hist.get(k, 0)}' for k in range(G + 1))
            print(f'# {fam:13s} {G:2d} {len(accepts):5d} {tpc:8.2f}   '
                  f'{hstr}', flush=True)
            results[(fam, G)] = tpc
            print(json.dumps({
                'metric': f'spec_accept_tokens_per_call_{fam}_G{G}',
                'value': round(tpc, 2), 'unit': 'tok/call'}), flush=True)

    if args.t_verify_ms and args.t_seq_ms:
        seq = 1000.0 / args.t_seq_ms
        print(f'# cost model: verify {args.t_verify_ms:.1f} ms/call, '
              f'sequential {seq:.1f} tok/s', flush=True)
        for (fam, G), tpc in results.items():
            pred = tpc * 1000.0 / args.t_verify_ms
            print(json.dumps({
                'metric': f'spec_predicted_tok_per_sec_{fam}_G{G}',
                'value': round(pred, 1), 'unit': 'tok/s',
                'vs_baseline': round(pred / seq, 2)}), flush=True)


if __name__ == '__main__':
    main()
