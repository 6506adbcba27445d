"""Model worker: streaming generation over HTTP + controller heartbeat.

(reference: groma/serve/model_worker.py:1-425 — whose model glue was stale
LLaVA code; here the worker drives the real Groma Generator).  Endpoints:
/worker_generate_stream (chunked JSON lines), /worker_get_status.  A
background thread heartbeats the controller every
WORKER_HEART_BEAT_INTERVAL seconds; a semaphore caps concurrency.
Served by stdlib ThreadingHTTPServer (FastAPI/uvicorn unavailable).
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from groma_tpu.constants import WORKER_HEART_BEAT_INTERVAL

logger = logging.getLogger('groma_tpu.serve.worker')


class ModelWorker:
    def __init__(self, model_dir: str, tokenizer_path=None,
                 worker_name: str = 'groma-worker',
                 model_name: str = 'groma', limit: int = 2,
                 controller_addr: str = '', use_engine: bool = False,
                 engine_slots: int = 4, quant_type: str = 'none',
                 kv_bits: int = 16, prefill_chunk: int = 0,
                 paged_kv: bool = False, kv_pool_tokens: int = 0,
                 spec_lookahead: int = 0):
        from groma_tpu.checkpoint.loader import load_groma
        from groma_tpu.data.tokenizer import load_tokenizer
        from groma_tpu.data.datasets.base import VLDataSpec
        from groma_tpu.eval.generate import Generator

        self.model, self.params, self.cfg = load_groma(model_dir)
        if model_dir == 'tiny':
            from groma_tpu.data.tokenizer import StubTokenizer
            self.tokenizer = StubTokenizer(self.cfg.llm.vocab_size,
                                           self.cfg.max_seq_len)
        else:
            self.tokenizer = load_tokenizer(tokenizer_path or model_dir,
                                            self.cfg.max_seq_len)
        self.spec = VLDataSpec(
            num_image_tokens=self.cfg.num_image_tokens,
            max_region_num=self.cfg.max_region_num,
            max_seq_len=self.cfg.max_seq_len,
            image_size=self.cfg.perceiver.image_size)
        qp = None
        self._quant = quant_type in ('int8', 'int4')
        if quant_type in ('bf16', 'int8', 'int4'):
            # weight-only quantized LLM (the single-16GB-chip production
            # config; reference run_groma.py 8bit/4bit switch).  'bf16'
            # builds the same fused qkv/gate_up tree at full precision
            # (quantize_llama_params bits=16) so unquantized serving
            # rides the engine/QuantGenerator programs too.
            from groma_tpu.eval.generate_quant import quantize_groma_llm
            qp = quantize_groma_llm(
                self.params, self.cfg,
                bits={'bf16': 16, 'int8': 8, 'int4': 4}[quant_type])
        self.engine = None
        if use_engine:
            # continuous batching: concurrent requests share the decode
            # step through slot interleaving (serve/engine.py) — true
            # per-token streaming, no per-request serialization
            from groma_tpu.serve.engine import BatchEngine
            # cache sized for the engine-wide generation cap (a request
            # asking for more is clamped; engine.submit enforces the
            # per-request cap so short consumers free their slot)
            engine_max_new = 256
            self.engine = BatchEngine(
                self.model, self.params, max_slots=engine_slots,
                max_len=self.cfg.max_seq_len + engine_max_new + 8,
                eos_id=self.tokenizer.sp.eos, qp=qp,
                max_new_tokens=engine_max_new,
                kv_bits=kv_bits if qp is not None else 16,
                prefill_chunk_tokens=prefill_chunk or None,
                paged_kv=paged_kv,
                kv_pool_tokens=kv_pool_tokens or None,
                spec_lookahead=spec_lookahead)
            limit = max(limit, engine_slots)
        if use_engine:
            self.generator = None
        elif qp is not None:
            from groma_tpu.eval.generate_quant import QuantGenerator
            self.generator = QuantGenerator(
                self.model, self.params, qp,
                max_len=self.cfg.max_seq_len + 64, kv_bits=kv_bits)
        else:
            self.generator = Generator(
                self.model, self.params,
                max_len=self.cfg.max_seq_len + 64)
        self.worker_name = worker_name
        self.model_name = model_name
        self.semaphore = threading.Semaphore(limit)
        self.queue_length = 0
        self.controller_addr = controller_addr
        if controller_addr:
            self._register()
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    # ------------------------------------------------------- liveness

    def status(self) -> dict:
        out = {'model_names': [self.model_name], 'speed': 1,
               'queue_length': self.queue_length}
        if self.engine is not None:
            # engine observability: TTFT, throughput, occupancy, pages
            out['engine'] = self.engine.stats()
        return out

    def _post(self, path: str, payload: dict):
        req = urllib.request.Request(
            self.controller_addr + path,
            data=json.dumps(payload).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=5) as r:
            return json.loads(r.read() or b'{}')

    def _register(self):
        self._post('/register_worker', {
            'worker_name': self.worker_name, 'check_heart_beat': True,
            'worker_status': self.status()})

    def _heartbeat_loop(self):
        import time
        while True:
            time.sleep(WORKER_HEART_BEAT_INTERVAL)
            try:
                ok = self._post('/receive_heart_beat', {
                    'worker_name': self.worker_name,
                    'queue_length': self.queue_length})
                if not ok.get('exist'):
                    self._register()
            except Exception:
                pass

    # ------------------------------------------------------ generation

    def generate_stream(self, request: dict):
        """Yield JSON lines {'text': partial, 'error_code': 0}."""
        import jax.numpy as jnp
        from groma_tpu.data.conversation import conv_templates
        from groma_tpu.data.datasets.base import intro_conversation
        from groma_tpu.data.tokenization import expand_template
        from groma_tpu.eval.generate import parse_region_tokens

        with self.semaphore:
            self.queue_length += 1
            try:
                image = np.asarray(request['image'], np.float32)
                conv = conv_templates.get(request.get('conv_temp', 'llava'))
                messages = intro_conversation(conv)
                # multi-turn: replay prior [user, assistant] pairs so the
                # model sees the full conversation (reference: the gradio
                # server threads conversation state through its requests)
                for turn in request.get('history', []):
                    messages.append((conv.roles[0], turn[0]))
                    messages.append((conv.roles[1], turn[1]))
                messages.append((conv.roles[0], request['prompt']))
                messages.append((conv.roles[1], None))
                ids = self.tokenizer.encode(conv.get_prompt(messages))
                t = expand_template(ids, None, self.tokenizer.sp,
                                    self.spec.num_image_tokens,
                                    self.spec.max_region_num,
                                    self.spec.max_seq_len)
                # stream in chunks: each scan-decoded chunk yields a
                # partial-text frame (reference: model_worker.py streamed
                # JSON chunks)
                max_new = int(request.get('max_new_tokens', 256))
                chunk = int(request.get('stream_chunk', 16))
                # optional stop string (reference: model_worker.py
                # params["stop"]); generation halts when the decoded
                # text contains it, and the text is truncated before it
                stop_str = request.get('stop') or None
                collected = []
                eos = self.tokenizer.sp.eos

                def cut_stop(text):
                    if stop_str and stop_str in text:
                        return text[:text.index(stop_str)], True
                    return text, False
                if self.engine is not None:
                    # continuous-batching path: tokens stream out as the
                    # engine's decode chunks land; concurrent requests
                    # interleave in the shared cache
                    sess = self.engine.submit(
                        image, t['input_ids'], t['region_slot'],
                        t['valid'], max_new_tokens=max_new,
                        temperature=float(request.get('temperature',
                                                      0.0)))
                    n = 0
                    for tk in sess.token_stream():
                        if tk != eos:
                            collected.append(tk)
                        n += 1
                        if n % chunk == 0:
                            text, hit = cut_stop(
                                self.tokenizer.decode(collected))
                            yield {'text': text, 'error_code': 0}
                            if hit:
                                sess.cancel()  # frees the slot next burst
                                break
                        if n >= max_new:
                            break
                    row_all = list(sess.tokens)
                    vis = {'selected_boxes': sess.vis['selected_boxes']
                           [None], 'selected_mask':
                           sess.vis['selected_mask'][None]}
                    tokens = np.asarray([row_all], np.int32)
                else:
                    gen_kwargs = dict(max_new_tokens=max_new, eos_id=eos)
                    temp = float(request.get('temperature', 0.0))
                    if temp > 0 and not self._quant:
                        # sampled decoding: bf16 Generator only (the
                        # quantized generator is greedy)
                        gen_kwargs['temperature'] = temp
                    tokens, vis = self.generator.generate(
                        jnp.asarray(image[None]),
                        jnp.asarray(t['input_ids'][None]),
                        jnp.asarray(t['region_slot'][None]),
                        jnp.asarray(t['valid'][None]), **gen_kwargs)
                    row = [int(x) for x in tokens[0]]
                    for i in range(0, len(row), chunk):
                        collected = [x for x in row[:i + chunk] if x != eos]
                        text, hit = cut_stop(
                            self.tokenizer.decode(collected))
                        yield {'text': text, 'error_code': 0}
                        if hit:
                            break
                ks = parse_region_tokens(
                    tokens, self.tokenizer.sp.box_idx_start)[0]
                cap = vis['selected_mask'].shape[1]
                boxes = [vis['selected_boxes'][0, k].tolist() for k in ks
                         if k < cap and vis['selected_mask'][0, k]]
                final = {'text': cut_stop(
                             self.tokenizer.decode(collected))[0],
                         'boxes': boxes, 'error_code': 0}
                if self.engine is not None and sess.truncated:
                    # paged mode: the shared page pool ran dry mid-stream
                    final['finish_reason'] = 'truncated'
                yield final
            except Exception as e:  # pragma: no cover
                yield {'text': f'server error: {e}', 'error_code': 1}
            finally:
                self.queue_length -= 1


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get('Content-Length', 0))
            data = json.loads(self.rfile.read(n) or b'{}')
            if self.path == '/worker_get_status':
                body = json.dumps(worker.status()).encode()
                self.send_response(200)
                self.send_header('Content-Type', 'application/json')
                self.end_headers()
                self.wfile.write(body)
            elif self.path == '/worker_generate_stream':
                self.send_response(200)
                self.send_header('Content-Type', 'application/jsonl')
                self.send_header('Transfer-Encoding', 'chunked')
                self.end_headers()
                for chunk in worker.generate_stream(data):
                    payload = (json.dumps(chunk) + '\0').encode()
                    self.wfile.write(f'{len(payload):X}\r\n'.encode())
                    self.wfile.write(payload + b'\r\n')
                self.wfile.write(b'0\r\n\r\n')
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-dir', default=None)
    ap.add_argument('--tiny', action='store_true',
                    help='random-weight tiny model (serving smoke test)')
    ap.add_argument('--engine', action='store_true',
                    help='continuous-batching engine (serve/engine.py)')
    # 8 is latency-balanced; aggregate decode keeps scaling with slots
    # (int4+kv8 measured: 765 tok/s at 8, 1,099 at 16, 1,315 at 24 —
    # docs/SERVING.md), so raise it when request volume sustains it
    ap.add_argument('--engine-slots', type=int, default=8)
    ap.add_argument('--quant_type', default='none',
                    choices=['none', 'bf16', 'int8', 'int4'],
                    help='weight-only quantized LLM (reference '
                         'run_groma.py 8bit/4bit switch); bf16 = '
                         'full-precision fused-stream decode tree')
    ap.add_argument('--kv-bits', type=int, default=16, choices=[16, 8],
                    help='8 = int8 KV cache (quantized paths only)')
    ap.add_argument('--prefill-chunk', type=int, default=0,
                    help='engine chunked prefill: interleave N-token '
                         'prompt chunks with decode bursts (0 = one-shot)')
    ap.add_argument('--spec-lookahead', type=int, default=0,
                    help='engine speculative decoding: G prompt-lookup '
                         'draft tokens per batched verify (greedy-only, '
                         'contiguous KV)')
    ap.add_argument('--paged-kv', action='store_true',
                    help='shared 128-token KV page pool (engine + '
                         'quant_type + --kv-bits 8): per-request HBM '
                         'proportional to stream length')
    ap.add_argument('--kv-pool-tokens', type=int, default=0,
                    help='page-pool size in tokens (0 = slots x max_len)')
    ap.add_argument('--host', default='0.0.0.0')
    ap.add_argument('--port', type=int, default=21002)
    ap.add_argument('--controller-address', default='')
    ap.add_argument('--worker-name', default='http://localhost:21002')
    ap.add_argument('--limit-model-concurrency', type=int, default=2)
    a = ap.parse_args()
    model_dir = 'tiny' if a.tiny else a.model_dir
    if not model_dir:
        ap.error('--model-dir or --tiny is required')
    worker = ModelWorker(model_dir, worker_name=a.worker_name,
                         limit=a.limit_model_concurrency,
                         controller_addr=a.controller_address,
                         use_engine=a.engine, engine_slots=a.engine_slots,
                         quant_type=a.quant_type, kv_bits=a.kv_bits,
                         spec_lookahead=a.spec_lookahead,
                         prefill_chunk=a.prefill_chunk,
                         paged_kv=a.paged_kv,
                         kv_pool_tokens=a.kv_pool_tokens)
    httpd = ThreadingHTTPServer((a.host, a.port), make_handler(worker))
    httpd.serve_forever()


if __name__ == '__main__':
    main()
