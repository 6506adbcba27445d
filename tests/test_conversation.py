"""Golden prompt strings — prompt-format parity is accuracy-critical for
checkpoint reuse (reference: groma/data/conversation.py templates)."""

from groma_tpu.constants import DEFAULT_TOKENS
from groma_tpu.data.conversation import conv_templates
from groma_tpu.data.datasets.base import INTRO_ANSWER, INTRO_INSTRUCT


def test_default_template_two_rounds():
    conv = conv_templates['default']
    msgs = [('USER', 'hello'), ('ASSISTANT', 'hi there')]
    got = conv.get_prompt(msgs)
    want = ("A chat between a curious user and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the user's questions. "
            "USER: hello ASSISTANT: hi there ")
    assert got == want


def test_llava_template_eos_sep():
    conv = conv_templates['llava']
    msgs = [('USER', 'q1'), ('ASSISTANT', 'a1'), ('USER', 'q2'),
            ('ASSISTANT', None)]
    got = conv.get_prompt(msgs)
    assert got.endswith('a1</s>USER: q2 ASSISTANT:')


def test_plain_template():
    conv = conv_templates['simple']
    assert conv.get_prompt(['a', 'b']) == 'a b'


def test_llama2_template():
    conv = conv_templates['llama_2']
    got = conv.get_prompt([('USER', 'question'), ('ASSISTANT', 'answer')])
    assert got.startswith('[INST] <<SYS>>\n')
    assert '[/INST] answer </s>' in got


def test_intro_round_strings():
    # the fixed intro round every dataset uses
    # (reference: e.g. refcoco_rec.py:162-167)
    assert INTRO_INSTRUCT == ('Here is an image with region crops from it. '
                              'Image: <image>. Regions: <region>.')
    assert INTRO_ANSWER == ('Thank you for the image! How can I assist '
                            'you with it?')


def test_grounded_answer_format():
    T = DEFAULT_TOKENS
    from groma_tpu.data.datasets.vl_datasets import _ground_answer, _refexp
    assert _refexp('the cat') == '<p>the cat</p>'
    assert _ground_answer(2) == \
        '<sep><roi><ground_box><ground_box></roi><sep>'
