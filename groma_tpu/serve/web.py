"""Web chat UI (reference: groma/serve/gradio_web_server.py — gradio is
unavailable here, so a dependency-free stdlib server ships an HTML/JS chat
page with image upload that routes through the controller to a worker,
mirroring the reference's gradio_web_server -> controller -> worker flow
(reference call stack SURVEY §3.5)."""

from __future__ import annotations

import argparse
import base64
import io
import json
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>Groma-TPU</title><style>
body{font-family:sans-serif;max-width:780px;margin:2em auto}
#log{border:1px solid #ccc;padding:1em;min-height:12em;white-space:pre-wrap}
textarea{width:100%%}</style></head><body>
<h2>Groma-TPU grounded chat</h2>
<input type="file" id="img" accept="image/*"><br><br>
<textarea id="q" rows="2" placeholder="Ask about the image..."></textarea>
<button onclick="send()">Send</button>
<div id="log"></div>
<script>
async function send(){
  const f = document.getElementById('img').files[0];
  if(!f){alert('pick an image');return;}
  const b64 = await new Promise(r=>{const fr=new FileReader();
    fr.onload=()=>r(fr.result.split(',')[1]);fr.readAsDataURL(f);});
  const q = document.getElementById('q').value;
  const log = document.getElementById('log');
  log.textContent += 'USER: '+q+'\\n';
  const resp = await fetch('/chat', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({image_b64:b64, prompt:q})});
  const data = await resp.json();
  log.textContent += 'ASSISTANT: '+data.text+'\\n';
  if(data.boxes && data.boxes.length)
    log.textContent += '  boxes: '+JSON.stringify(data.boxes)+'\\n';
}
</script></body></html>"""


def make_handler(controller_addr: str, model_name: str):
    def post_json(url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.read()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = PAGE.encode()
            self.send_response(200)
            self.send_header('Content-Type', 'text/html')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != '/chat':
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get('Content-Length', 0))
            data = json.loads(self.rfile.read(n))
            # resolve a worker through the controller
            raw = post_json(controller_addr + '/get_worker_address',
                            {'model': model_name})
            addr = json.loads(raw)['address']
            if not addr:
                out = {'text': 'no worker available', 'error_code': 2}
            else:
                from PIL import Image

                from groma_tpu.data.image_pipeline import normalize, resize
                img = np.asarray(Image.open(io.BytesIO(
                    base64.b64decode(data['image_b64']))).convert('RGB'))
                img448, _ = resize(img, (448, 448))
                payload = {'image': normalize(img448).tolist(),
                           'prompt': data['prompt']}
                raw = post_json(addr + '/worker_generate_stream', payload)
                chunks = [c for c in raw.decode().split('\0') if c.strip()]
                out = json.loads(chunks[-1])
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--host', default='0.0.0.0')
    ap.add_argument('--port', type=int, default=7860)
    ap.add_argument('--controller-url', default='http://localhost:21001')
    ap.add_argument('--model', default='groma')
    a = ap.parse_args()
    httpd = ThreadingHTTPServer(
        (a.host, a.port), make_handler(a.controller_url, a.model))
    print(f'web UI on http://{a.host}:{a.port}')
    httpd.serve_forever()


if __name__ == '__main__':
    main()
