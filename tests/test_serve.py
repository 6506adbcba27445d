"""Controller/worker serving-topology tests (the HTTP smoke-test analogue
of reference: groma/serve/test_message.py + controller endpoints)."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from groma_tpu.serve.controller import (Controller, DispatchMethod,
                                        make_handler)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read() or b'{}')


@pytest.fixture
def server():
    controller = Controller('shortest_queue')
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(controller))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{httpd.server_address[1]}', controller
    httpd.shutdown()


def test_register_dispatch_heartbeat(server):
    url, controller = server
    _post(url + '/register_worker', {
        'worker_name': 'w1', 'check_heart_beat': True,
        'worker_status': {'model_names': ['groma'], 'speed': 1,
                          'queue_length': 0}})
    _post(url + '/register_worker', {
        'worker_name': 'w2', 'check_heart_beat': True,
        'worker_status': {'model_names': ['groma'], 'speed': 1,
                          'queue_length': 5}})
    models = _post(url + '/list_models', {})['models']
    assert models == ['groma']
    # shortest queue picks the idle worker
    addr = _post(url + '/get_worker_address', {'model': 'groma'})['address']
    assert addr == 'w1'
    # heartbeat updates queue length
    r = _post(url + '/receive_heart_beat',
              {'worker_name': 'w1', 'queue_length': 99})
    assert r['exist']
    addr = _post(url + '/get_worker_address', {'model': 'groma'})['address']
    assert addr == 'w2'
    # unknown worker heartbeat -> not exist (worker re-registers)
    r = _post(url + '/receive_heart_beat',
              {'worker_name': 'ghost', 'queue_length': 0})
    assert not r['exist']
    # unknown model -> empty address
    assert _post(url + '/get_worker_address',
                 {'model': 'nope'})['address'] == ''


def test_stale_worker_pruned(server):
    url, controller = server
    controller.register_worker('old', True, {
        'model_names': ['groma'], 'speed': 1, 'queue_length': 0})
    # age the heartbeat beyond expiry
    controller.workers['old'].last_heart_beat -= 1000
    assert _post(url + '/get_worker_address',
                 {'model': 'groma'})['address'] == ''
    assert 'old' not in controller.workers


def test_lottery_dispatch():
    c = Controller('lottery')
    c.register_worker('a', False, {'model_names': ['m'], 'speed': 1,
                                   'queue_length': 0})
    c.register_worker('b', False, {'model_names': ['m'], 'speed': 9,
                                   'queue_length': 0})
    picks = [c.get_worker_address('m') for _ in range(200)]
    # speed-weighted: 'b' should dominate
    assert picks.count('b') > 120


@pytest.mark.slow
def test_worker_quant_engine_stream():
    """Tiny worker end to end over HTTP: continuous-batching engine +
    int8 weight-only LLM + chunked prefill (the new serving flags)."""
    from groma_tpu.serve.worker import ModelWorker, make_handler as mk_w

    w = ModelWorker('tiny', use_engine=True, engine_slots=2,
                    quant_type='int8', kv_bits=16, prefill_chunk=16)
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), mk_w(w))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        sz = w.cfg.perceiver.image_size
        image = [[[0.1, 0.2, 0.3]] * sz] * sz
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/worker_generate_stream',
            data=json.dumps({'prompt': 'what is here?', 'image': image,
                             'max_new_tokens': 6}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read().decode(errors='replace')
        assert 'error_code' in body
        frames = [json.loads(x) for x in body.split('\0') if
                  x.strip().startswith('{')]
        assert frames and frames[-1]['error_code'] == 0
        assert 'boxes' in frames[-1]
        # multi-turn: replay the first exchange as history (web.py flow)
        req2 = urllib.request.Request(
            f'http://127.0.0.1:{port}/worker_generate_stream',
            data=json.dumps({'prompt': 'and what else?', 'image': image,
                             'history': [['what is here?',
                                          frames[-1]['text']]],
                             'max_new_tokens': 4}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req2, timeout=600) as r:
            body2 = r.read().decode(errors='replace')
        frames2 = [json.loads(x) for x in body2.split('\0') if
                   x.strip().startswith('{')]
        assert frames2 and frames2[-1]['error_code'] == 0
    finally:
        httpd.shutdown()
        if w.engine is not None:
            w.engine.close()


def test_web_ui_page_and_votes(tmp_path):
    """Web UI: page serves the control set (canvas/regenerate/votes) and
    /vote appends JSON lines (reference: gradio_web_server
    vote_last_response)."""
    from groma_tpu.serve.web import make_handler as mk_web

    vlog = str(tmp_path / 'votes.jsonl')
    httpd = ThreadingHTTPServer(
        ('127.0.0.1', 0), mk_web('http://127.0.0.1:1', 'groma',
                                 vote_log=vlog))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/', timeout=30) as r:
            page = r.read().decode()
        for needle in ('canvas', 'regenerate()', 'vote(1)', 'temp',
                       'max tokens'):
            assert needle in page, needle
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/vote',
            data=json.dumps({'prompt': 'p', 'answer': 'a',
                             'vote': 1}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())['ok'] is True
        rec = json.loads(open(vlog).read().strip())
        assert rec['vote'] == 1 and rec['prompt'] == 'p'
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_worker_stop_string():
    """'stop' request param truncates generation at the stop string
    (reference: model_worker.py params['stop']).  The stub tokenizer
    decodes plain tokens as 'w<N>', so stop='w' hits immediately."""
    from groma_tpu.serve.worker import ModelWorker, make_handler as mk_w

    w = ModelWorker('tiny')
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), mk_w(w))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        sz = w.cfg.perceiver.image_size
        image = [[[0.1, 0.2, 0.3]] * sz] * sz
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/worker_generate_stream',
            data=json.dumps({'prompt': 'what is here?', 'image': image,
                             'max_new_tokens': 6,
                             'stop': 'w'}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read().decode(errors='replace')
        frames = [json.loads(x) for x in body.split('\0') if
                  x.strip().startswith('{')]
        assert frames and frames[-1]['error_code'] == 0
        assert 'w' not in frames[-1]['text']
    finally:
        httpd.shutdown()
