"""VQA answering + pairwise judge harness (LLaVA-bench style).

(reference: groma/eval/model_vqa.py question answering,
groma/eval/eval_gpt_review_visual.py + summarize_gpt_review.py + the
static judge assets in groma/eval/table/).  The judge is a pluggable
callable — the reference hardcodes the OpenAI API; any LLM endpoint (or a
human) can fill the same role here.  Prompt structure and the relative
score summary match the reference protocol.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterable, List

import numpy as np

from groma_tpu.data.conversation import conv_templates
from groma_tpu.data.datasets.base import VLDataSpec, intro_conversation
from groma_tpu.data.tokenization import expand_template
from groma_tpu.eval.generate import Generator

RULE_PATH = __file__.rsplit('/', 1)[0] + '/table/rule.json'


def load_rules() -> dict:
    """Per-category judge rules (reference: groma/eval/table/rule.json)."""
    with open(RULE_PATH) as f:
        return json.load(f)


JUDGE_SYSTEM = (
    'You are a helpful and precise assistant for checking the quality of '
    'the answer.')
JUDGE_RULE = (
    'We would like to request your feedback on the performance of two AI '
    'assistants in response to the user question displayed above. The user '
    'asks the question on observing an image. Please rate the helpfulness, '
    'relevance, accuracy, level of details of their responses. Each '
    'assistant receives an overall score on a scale of 1 to 10, where a '
    'higher score indicates better overall performance. Please first '
    'output a single line containing only two values indicating the scores '
    'for Assistant 1 and 2, respectively. In the subsequent line, please '
    'provide a comprehensive explanation of your evaluation.')


def answer_questions(generator: Generator, samples: Iterable[dict],
                     tokenizer, spec: VLDataSpec,
                     conv_temp: str = 'llava',
                     max_new_tokens: int = 256) -> List[dict]:
    """samples: dicts with 'image' (normalized), 'question', 'question_id'.
    Returns [{'question_id', 'text'}], the model_vqa.py output shape."""
    import jax.numpy as jnp
    conv = conv_templates[conv_temp]
    sp = tokenizer.sp
    out = []
    for s in samples:
        messages = intro_conversation(conv)
        messages.append((conv.roles[0], s['question']))
        messages.append((conv.roles[1], None))
        ids = tokenizer.encode(conv.get_prompt(messages))
        t = expand_template(ids, None, sp, spec.num_image_tokens,
                            spec.max_region_num, spec.max_seq_len)
        tokens, _ = generator.generate(
            jnp.asarray(s['image'][None]),
            jnp.asarray(t['input_ids'][None]),
            jnp.asarray(t['region_slot'][None]),
            jnp.asarray(t['valid'][None]),
            max_new_tokens=max_new_tokens, eos_id=sp.eos)
        text = tokenizer.decode(
            [tok for tok in tokens[0] if tok != sp.eos])
        out.append({'question_id': s['question_id'], 'text': text})
    return out


def build_judge_prompt(question: str, context: str, answer1: str,
                       answer2: str) -> str:
    """(reference: eval_gpt_review_visual.py prompt assembly)."""
    return (f'[Context]\n{context}\n\n'
            f'[Question]\n{question}\n\n'
            f'[Assistant 1]\n{answer1}\n\n[End of Assistant 1]\n\n'
            f'[Assistant 2]\n{answer2}\n\n[End of Assistant 2]\n\n'
            f'[System]\n{JUDGE_RULE}\n\n')


def parse_judge_scores(review: str):
    """First line 'x y' -> (x, y); (-1, -1) on failure
    (reference: eval_gpt_review_visual.py parse_score)."""
    try:
        parts = review.splitlines()[0].replace(',', ' ').split()
        return float(parts[0]), float(parts[1])
    except Exception:
        return -1.0, -1.0


def review_answers(questions: List[dict], answers1: List[dict],
                   answers2: List[dict], contexts: Dict,
                   judge: Callable[[str, str], str]) -> List[dict]:
    """Run the pairwise judge; ``judge(system, prompt) -> review text``."""
    reviews = []
    a1 = {a['question_id']: a for a in answers1}
    a2 = {a['question_id']: a for a in answers2}
    for q in questions:
        qid = q['question_id']
        prompt = build_judge_prompt(q['text'],
                                    contexts.get(qid, ''),
                                    a1[qid]['text'], a2[qid]['text'])
        review = judge(JUDGE_SYSTEM, prompt)
        s1, s2 = parse_judge_scores(review)
        reviews.append({'question_id': qid, 'content': review,
                        'tuple': [s1, s2],
                        'category': q.get('category', 'all')})
    return reviews


def summarize_reviews(reviews: List[dict]) -> dict:
    """Relative score summary (reference: summarize_gpt_review.py)."""
    by_cat = {}
    for r in reviews:
        by_cat.setdefault(r['category'], []).append(r['tuple'])
    out = {}
    for cat, pairs in by_cat.items():
        arr = np.asarray([p for p in pairs if p[0] >= 0])
        if len(arr) == 0:
            continue
        out[cat] = {
            'relative_score': float(100 * (arr[:, 1] / arr[:, 0]).mean()),
            'score1': float(arr[:, 0].mean()),
            'score2': float(arr[:, 1].mean()),
            'n': len(arr),
        }
    return out
