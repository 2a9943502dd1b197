"""Web annotation editor for column/character boxes over column_info.csv.

Capability parity with the reference's Tk ``GUI_annotator.py`` (P30, 2846
LoC): browse column crops, edit character boxes (move/resize/add/delete),
merge two columns, split a column at a character, undo via automatic CSV
backups — rebuilt as a canvas-based web app on the same stdlib http.server
as the rest of ``kuzu.serve`` (a Tk GUI can't run on a headless TPU host).

API (JSON unless noted):
  GET  /                   editor page (HTML+JS)
  GET  /rows?page=N        paged row summaries
  GET  /row/<i>            one row: image (base64) + boxes + text
  POST /row/<i>            {char_boxes_in_column, unicode_ids} update
  POST /merge              {a, b} merge column rows a <- b (delete b)
  POST /split              {row, at} split row's chars [0,at) / [at,...)
  POST /undo               restore the previous CSV backup
"""

from __future__ import annotations

import base64
import json
import shutil
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

EDITOR_HTML = r"""<!doctype html><html><head><title>kuzu annotator</title>
<style>
body{font-family:sans-serif;margin:1em}#wrap{display:flex;gap:16px}
#canvas{border:1px solid #888;cursor:crosshair}
#side{width:360px;font-size:13px}button{margin:2px}
.row-link{cursor:pointer;color:#06c;margin-right:6px}
#chars span{cursor:pointer;padding:1px 4px;border:1px solid #ccc;margin:1px}
#chars span.sel{background:#fdd}
</style></head><body>
<h3>kuzu annotator</h3>
<div id=wrap>
<canvas id=canvas width=400 height=800></canvas>
<div id=side>
 <div id=rows></div><hr>
 <div>row <span id=cur>-</span>:
  <input id=text size=20 placeholder="unicode ids / text">
  <button onclick="save()">save</button>
  <button onclick="delBox()">delete box</button>
  <button onclick="addMode=!addMode">add box</button>
  <button onclick="undo()">undo</button></div>
 <div>char label: <input id=chlabel size=8 placeholder="U+XXXX">
  <button onclick="setLabel()">set</button>
  move char to row <input id=mvrow size=3>
  <button onclick="moveChar()">move</button></div>
 <div>merge: <input id=ma size=3><input id=mb size=3>
  <button onclick="mergeRows()">merge</button>
  split at char <input id=sp size=3>
  <button onclick="splitRow()">split</button></div>
 <div id=chars></div>
 <div>zoom: wheel &middot; pan: shift-drag &middot; resize: drag corner &middot;
  del key deletes</div>
 <div id=msg></div>
</div></div>
<script>
let cur=-1, boxes=[], unis=[], sel=-1, img=new Image(), addMode=false, drag=null;
let zoom=1, base=1, ox=0, oy=0;   // zoomable, pannable view transform
const cv=document.getElementById('canvas'), cx=cv.getContext('2d');
const HANDLE=8;
function toImg(e){return [(e.offsetX-ox)/(base*zoom),(e.offsetY-oy)/(base*zoom)];}
async function loadRows(){
  const r=await fetch('/rows?page=0'); const d=await r.json();
  document.getElementById('rows').innerHTML=d.rows.map(
    t=>`<span class=row-link onclick="loadRow(${t.index})">#${t.index}(${t.n_chars})</span>`).join('');
}
async function loadRow(i){
  const r=await fetch('/row/'+i); const d=await r.json();
  cur=i; boxes=d.boxes; unis=d.unicode_ids.split(/\s+/).filter(x=>x); sel=-1;
  zoom=1; ox=0; oy=0;
  document.getElementById('cur').textContent=i;
  document.getElementById('text').value=d.unicode_ids;
  img.onload=()=>{base=Math.min(400/img.width, 800/img.height);
    cv.width=400; cv.height=800; draw();};
  img.src='data:image/png;base64,'+d.image_b64;
}
function draw(){
  const s=base*zoom;
  cx.setTransform(1,0,0,1,0,0); cx.clearRect(0,0,cv.width,cv.height);
  cx.setTransform(s,0,0,s,ox,oy);
  cx.drawImage(img,0,0);
  boxes.forEach((b,i)=>{cx.strokeStyle=i===sel?'red':'lime';cx.lineWidth=2/s;
    cx.strokeRect(b[0],b[1],b[2]-b[0],b[3]-b[1]);
    if(i===sel){cx.fillStyle='red';cx.fillRect(b[2]-HANDLE/s,b[3]-HANDLE/s,HANDLE/s,HANDLE/s);}});
  renderChars();
}
function renderChars(){
  document.getElementById('chars').innerHTML=boxes.map((b,i)=>
    `<span class="${i===sel?'sel':''}" onclick="selChar(${i})">${i}:${unis[i]||'?'}</span>`).join('');
}
function selChar(i){sel=i;document.getElementById('chlabel').value=unis[i]||'';draw();}
cv.onwheel=e=>{e.preventDefault();
  const f=e.deltaY<0?1.2:1/1.2, [ix,iy]=toImg(e);
  zoom=Math.max(0.2,Math.min(zoom*f,20));
  ox=e.offsetX-ix*base*zoom; oy=e.offsetY-iy*base*zoom; draw();};
cv.onmousedown=e=>{
  if(e.shiftKey){drag={mode:'pan',x:e.offsetX,y:e.offsetY,ox,oy};return;}
  const [x,y]=toImg(e), s=base*zoom;
  if(addMode){drag={mode:'new',x,y};boxes.push([x,y,x+1,y+1]);unis.push('?');sel=boxes.length-1;return;}
  if(sel>=0){const b=boxes[sel];
    if(Math.abs(x-b[2])<HANDLE/s&&Math.abs(y-b[3])<HANDLE/s){drag={mode:'resize'};return;}}
  sel=boxes.findIndex(b=>x>=b[0]&&x<=b[2]&&y>=b[1]&&y<=b[3]);
  if(sel>=0){drag={mode:'move',x,y,orig:[...boxes[sel]]};
    document.getElementById('chlabel').value=unis[sel]||'';}
  draw();
};
cv.onmousemove=e=>{
  if(!drag)return;
  if(drag.mode==='pan'){ox=drag.ox+e.offsetX-drag.x;oy=drag.oy+e.offsetY-drag.y;draw();return;}
  const [x,y]=toImg(e);
  if(drag.mode==='new'||drag.mode==='resize'){boxes[sel][2]=x;boxes[sel][3]=y;}
  else{const dx=x-drag.x,dy=y-drag.y;const o=drag.orig;
    boxes[sel]=[o[0]+dx,o[1]+dy,o[2]+dx,o[3]+dy];}
  draw();
};
cv.onmouseup=()=>{drag=null;addMode=false;};
document.onkeydown=e=>{if(e.key==='Delete')delBox();};
function delBox(){if(sel>=0){boxes.splice(sel,1);unis.splice(sel,1);sel=-1;
  document.getElementById('text').value=unis.join(' ');draw();}}
function setLabel(){if(sel>=0){unis[sel]=document.getElementById('chlabel').value;
  document.getElementById('text').value=unis.join(' ');draw();}}
async function save(){
  const r=await fetch('/row/'+cur,{method:'POST',body:JSON.stringify(
    {char_boxes_in_column:boxes,unicode_ids:document.getElementById('text').value})});
  msg(await r.text());
}
async function moveChar(){
  if(sel<0)return msg('select a char first');
  const r=await fetch('/move',{method:'POST',body:JSON.stringify(
    {src:cur,char:sel,dst:+document.getElementById('mvrow').value})});
  msg(await r.text());loadRow(cur);loadRows();
}
async function mergeRows(){
  const r=await fetch('/merge',{method:'POST',body:JSON.stringify(
    {a:+document.getElementById('ma').value,b:+document.getElementById('mb').value})});
  msg(await r.text());loadRows();
}
async function splitRow(){
  const r=await fetch('/split',{method:'POST',body:JSON.stringify(
    {row:cur,at:+document.getElementById('sp').value})});
  msg(await r.text());loadRows();
}
async function undo(){msg(await (await fetch('/undo',{method:'POST'})).text());if(cur>=0)loadRow(cur);}
function msg(t){document.getElementById('msg').textContent=t;}
loadRows();
</script></body></html>"""


class AnnotationStore:
    """column_info.csv editing with timestamped backups for undo."""

    def __init__(self, csv_path: str | Path):
        import pandas as pd

        self.csv_path = Path(csv_path)
        self.df = pd.read_csv(self.csv_path)
        self.lock = threading.Lock()
        self.backup_dir = self.csv_path.parent / ".annotator_backups"
        self.backup_dir.mkdir(exist_ok=True)

    def _backup(self) -> None:
        dst = self.backup_dir / f"{int(time.time() * 1000)}.csv"
        shutil.copy(self.csv_path, dst)

    def _flush(self) -> None:
        self.df.to_csv(self.csv_path, index=False)

    def row(self, i: int) -> dict:
        import cv2

        r = self.df.iloc[i]
        p = self.csv_path.parent / str(r["column_image"])
        img = cv2.imread(str(p))
        b64 = ""
        if img is not None:
            ok, png = cv2.imencode(".png", img)
            if ok:
                b64 = base64.b64encode(png.tobytes()).decode()
        try:
            boxes = json.loads(r.get("char_boxes_in_column", "[]"))
        except (json.JSONDecodeError, TypeError):
            boxes = []
        return {
            "index": i,
            "image_b64": b64,
            "boxes": boxes,
            "unicode_ids": str(r.get("unicode_ids", "")),
        }

    def update_row(self, i: int, boxes: list, unicode_ids: str) -> None:
        with self.lock:
            self._backup()
            self.df.at[i, "char_boxes_in_column"] = json.dumps(
                [[round(float(v), 1) for v in b] for b in boxes]
            )
            self.df.at[i, "unicode_ids"] = unicode_ids
            self._flush()

    def merge(self, a: int, b: int) -> None:
        """Append row b's chars to row a (column merge), drop b."""
        with self.lock:
            self._backup()
            ba = json.loads(self.df.at[a, "char_boxes_in_column"])
            bb = json.loads(self.df.at[b, "char_boxes_in_column"])
            ua = str(self.df.at[a, "unicode_ids"]).split()
            ub = str(self.df.at[b, "unicode_ids"]).split()
            self.df.at[a, "char_boxes_in_column"] = json.dumps(ba + bb)
            self.df.at[a, "unicode_ids"] = " ".join(ua + ub)
            self.df = self.df.drop(index=self.df.index[b]).reset_index(drop=True)
            self._flush()

    def split(self, row: int, at: int) -> None:
        """Split a row's chars into [0, at) and [at, ...); new row appended."""
        with self.lock:
            self._backup()
            boxes = json.loads(self.df.at[row, "char_boxes_in_column"])
            unis = str(self.df.at[row, "unicode_ids"]).split()
            at = max(1, min(at, len(boxes) - 1))
            first, second = boxes[:at], boxes[at:]
            u1, u2 = unis[:at], unis[at:]
            self.df.at[row, "char_boxes_in_column"] = json.dumps(first)
            self.df.at[row, "unicode_ids"] = " ".join(u1)
            new = self.df.iloc[row].copy()
            new["char_boxes_in_column"] = json.dumps(second)
            new["unicode_ids"] = " ".join(u2)
            self.df.loc[len(self.df)] = new
            self._flush()

    def move_char(self, src: int, char: int, dst: int) -> None:
        """Move one character (box + unicode id) from row src to row dst —
        the Tk editor's cross-column move (reassign a glyph that the column
        detector attached to the wrong column)."""
        with self.lock:
            self._backup()
            sb = json.loads(self.df.at[src, "char_boxes_in_column"])
            su = str(self.df.at[src, "unicode_ids"]).split()
            if not (0 <= char < len(sb)):
                raise IndexError(f"char {char} out of range for row {src}")
            box = sb.pop(char)
            uni = su.pop(char) if char < len(su) else "?"
            db = json.loads(self.df.at[dst, "char_boxes_in_column"])
            du = str(self.df.at[dst, "unicode_ids"]).split()
            db.append(box)
            du.append(uni)
            self.df.at[src, "char_boxes_in_column"] = json.dumps(sb)
            self.df.at[src, "unicode_ids"] = " ".join(su)
            self.df.at[dst, "char_boxes_in_column"] = json.dumps(db)
            self.df.at[dst, "unicode_ids"] = " ".join(du)
            self._flush()

    def n_chars(self, i: int) -> int:
        try:
            return len(json.loads(self.df.at[i, "char_boxes_in_column"]))
        except (json.JSONDecodeError, TypeError, KeyError):
            return 0

    def undo(self) -> bool:
        with self.lock:
            import pandas as pd

            backups = sorted(self.backup_dir.glob("*.csv"))
            if not backups:
                return False
            latest = backups[-1]
            shutil.copy(latest, self.csv_path)
            latest.unlink()
            self.df = pd.read_csv(self.csv_path)
            return True


def make_annotator_server(csv_path: str | Path, host="127.0.0.1", port=8002):
    store = AnnotationStore(csv_path)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            body = body if isinstance(body, bytes) else body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path in ("/", "/index.html"):
                self._send(200, EDITOR_HTML, "text/html")
            elif u.path == "/rows":
                page = int(parse_qs(u.query).get("page", ["0"])[0])
                lo = page * 50
                rows = [
                    {"index": int(i), "n_chars": store.n_chars(i)}
                    for i in range(lo, min(lo + 50, len(store.df)))
                ]
                self._send(200, json.dumps({"rows": rows, "total": len(store.df)}))
            elif u.path.startswith("/row/"):
                i = int(u.path.rsplit("/", 1)[1])
                if not (0 <= i < len(store.df)):
                    self._send(404, '{"error": "row out of range"}')
                    return
                self._send(200, json.dumps(store.row(i)))
            else:
                self._send(404, '{"error": "not found"}')

        def do_POST(self):
            u = urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            try:
                data = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, '{"error": "bad json"}')
                return
            try:
                if u.path.startswith("/row/"):
                    i = int(u.path.rsplit("/", 1)[1])
                    store.update_row(
                        i, data.get("char_boxes_in_column", []),
                        str(data.get("unicode_ids", "")),
                    )
                    self._send(200, '{"status": "saved"}')
                elif u.path == "/move":
                    store.move_char(
                        int(data["src"]), int(data["char"]), int(data["dst"])
                    )
                    self._send(200, '{"status": "moved"}')
                elif u.path == "/merge":
                    store.merge(int(data["a"]), int(data["b"]))
                    self._send(200, '{"status": "merged"}')
                elif u.path == "/split":
                    store.split(int(data["row"]), int(data["at"]))
                    self._send(200, '{"status": "split"}')
                elif u.path == "/undo":
                    ok = store.undo()
                    self._send(200, json.dumps({"status": "undone" if ok else "nothing to undo"}))
                else:
                    self._send(404, '{"error": "not found"}')
            except (KeyError, IndexError, ValueError) as e:
                self._send(400, json.dumps({"error": str(e)}))

    return ThreadingHTTPServer((host, port), Handler), store


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("kuzu annotator")
    ap.add_argument("--csv", required=True, help="column_info.csv to edit")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8002)
    args = ap.parse_args(argv)
    srv, _ = make_annotator_server(args.csv, args.host, args.port)
    print(f"annotating {args.csv} on http://{args.host}:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
