"""Host-side GUI: a dependency-free web dashboard renderer.

TPU-native equivalent of the reference's Dear ImGui layer
(`/root/reference/lib/FlightCore/src/gui.jl`). The reference's `Renderer`
is an `IODevice` owning an ImGui context + GLFW window + OpenGL3 backend
(`gui.jl:53-153`) whose `render!` runs one immediate-mode frame calling a
user draw function (`gui.jl:173-209`). Here the renderer is a small
threaded HTTP server (stdlib only — the build environment has no display
and no GL stack) serving an immediate-mode web page:

- the *draw protocol* is a pure function `f_draw(snapshot, y) -> [widgets]`
  returning a declarative widget list each refresh (the web analog of
  `GUI.draw!`, `gui.jl:243-246`);
- the *widget kit* mirrors `gui.jl:286-368` by name and semantics:
  `mode_button` (3-state requested/active coloring, `gui.jl:325-343`),
  `dynamic_button`, `toggle_switch`, `display_bar`, `safe_slider`,
  `safe_input`;
- widget interactions are POSTed back and surface through the standard
  `InputDevice.get_data` path, so a `Renderer` attaches to the
  `RealTimeLoop` exactly like a joystick, with an `IOMapping` deciding how
  events mutate the input pytree (`iodevices.jl:38-51`);
- the refresh period plays the role of `sync` vsync control
  (`gui.jl:116-124`; pacing in `sim.jl:241-247`).

Endpoints: `GET /` page, `GET /frame` JSON widget frame, `POST /event`
widget interaction, `GET /snapshot` raw latest state snapshot.
"""

import colorsys
import json
import math
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from flightjax.io.devices import InputDevice, OutputDevice

# reference HSV palette (`gui.jl:270-273`)
HSV_gray = (0.0, 0.0, 0.3)
HSV_amber = (0.13, 0.6, 0.6)
HSV_green = (0.4, 0.6, 0.6)
HSV_red = (0.0, 0.7, 0.7)


def _css(hsv):
    r, g, b = colorsys.hsv_to_rgb(*hsv)
    return f"rgb({int(255*r)},{int(255*g)},{int(255*b)})"


def _num(x):
    x = float(x)
    return 0.0 if math.isnan(x) else x


# ------------------------------------------------------------- widget kit


def text(label):
    return {"kind": "text", "label": str(label)}


def dynamic_button(label, hsv=HSV_gray, id=None):
    """Momentary push button (`gui.jl:298-323`); emits (id, True) on click."""
    return {"kind": "button", "label": label, "id": id or label,
            "color": _css(hsv)}


def mode_button(label, mode, requested, active, id=None):
    """3-state mode selector (`gui.jl:325-343`): gray = idle, amber =
    requested-but-not-active, green = active. Emits (id, mode) on click."""
    hsv = HSV_green if active == mode else (
        HSV_amber if requested == mode else HSV_gray)
    return {"kind": "button", "label": label, "id": id or label,
            "value": mode, "color": _css(hsv)}


def toggle_switch(label, enabled, hue=0.4, id=None):
    """On/off switch colored by state (`gui.jl:286-296`); emits (id, bool)."""
    return {"kind": "toggle", "label": label, "id": id or label,
            "value": bool(enabled), "hue": hue}


def display_bar(label, value, lo=0.0, hi=1.0):
    """Read-only progress bar with numeric overlay (`gui.jl:345-350`)."""
    return {"kind": "bar", "label": label, "value": _num(value),
            "lo": _num(lo), "hi": _num(hi)}


def safe_slider(label, value, lo=-1.0, hi=1.0, id=None):
    """Slider that writes only while the user holds it (`gui.jl:352-360`);
    emits (id, float)."""
    return {"kind": "slider", "label": label, "id": id or label,
            "value": _num(value), "lo": _num(lo), "hi": _num(hi)}


def safe_input(label, value, id=None):
    """Numeric input committing on enter (`gui.jl:362-368`)."""
    return {"kind": "input", "label": label, "id": id or label,
            "value": _num(value)}


def section(label, children, open=False, id=None):
    """Collapsible group of widgets — the web analog of the reference's
    per-model ImGui tree nodes (`gui.jl:243-246`). Open/closed state is
    kept client-side across refreshes, keyed by `id`."""
    return {"kind": "section", "label": str(label), "id": id or str(label),
            "open": bool(open), "children": list(children)}


def sparkline(label, values, lo=None, hi=None, width=220, height=30):
    """Small history plot of a scalar series (most recent last). Auto-ranges
    when lo/hi are omitted."""
    vals = [_num(v) for v in values]
    if not vals:
        vals = [0.0]
    if lo is None:
        lo = min(vals)
    if hi is None:
        hi = max(vals)
    if hi - lo < 1e-12:
        lo, hi = lo - 0.5, hi + 0.5
    return {"kind": "spark", "label": str(label), "values": vals,
            "lo": _num(lo), "hi": _num(hi), "w": int(width), "h": int(height)}


def canvas(shapes, width=360, height=240):
    """2-D vector canvas (the web analog of the reference's custom ImGui
    draw-list canvas, `robot2d.jl:141-199`). `shapes` is a list of dicts:
    {"line": [x1,y1,x2,y2]}, {"circle": [cx,cy,r]}, {"poly": [x1,y1,...]},
    each optionally with "color". Coordinates are in [0,1]x[0,1], origin
    bottom-left."""
    out = []
    for s in shapes:
        d = dict(s)
        for key in ("line", "circle", "poly"):
            if key in d:
                d[key] = [_num(v) for v in d[key]]
        out.append(d)
    return {"kind": "canvas", "shapes": out, "w": int(width),
            "h": int(height)}


_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>flightjax</title><style>
body{background:#15181d;color:#cfd6e1;font:13px monospace;margin:14px}
.w{margin:3px 0}.lbl{display:inline-block;min-width:160px}
button{border:0;border-radius:3px;color:#fff;padding:4px 10px;margin:2px;
cursor:pointer;font:inherit}
.bar{display:inline-block;width:220px;height:14px;background:#262b33;
border-radius:3px;vertical-align:middle;position:relative}
.bar>div{height:100%;background:rgb(40,150,90);border-radius:3px}
.bar>span{position:absolute;left:6px;top:0;font-size:11px;color:#fff}
input[type=range]{width:220px;vertical-align:middle}
input[type=number]{width:90px;background:#262b33;color:#cfd6e1;border:1px
solid #3a4150}
details{margin:2px 0 2px 8px;border-left:1px solid #3a4150;padding-left:8px}
summary{cursor:pointer;color:#8fa3c0}</style></head>
<body><div id="root">connecting…</div><script>
const post=(id,value)=>fetch('/event',{method:'POST',
  body:JSON.stringify({id,value})});
let held=null;
const openSet=new Set();
function render(frame){
  const root=document.getElementById('root');root.innerHTML='';
  renderInto(root,frame);}
function renderInto(root,frame){
  for(const w of frame){
    if(w.kind==='section'){const dt=document.createElement('details');
      dt.open=openSet.has(w.id)||(w.open&&!openSet.has('!'+w.id));
      const sm=document.createElement('summary');sm.textContent=w.label;
      dt.appendChild(sm);
      dt.ontoggle=()=>{if(dt.open){openSet.add(w.id);openSet.delete('!'+w.id);}
        else{openSet.delete(w.id);openSet.add('!'+w.id);}};
      renderInto(dt,w.children);root.appendChild(dt);continue;}
    const d=document.createElement('div');d.className='w';
    if(w.kind==='text'){d.textContent=w.label;}
    else if(w.kind==='spark'){
      d.innerHTML=`<span class="lbl">${w.label}</span>`;
      const c=document.createElement('canvas');c.width=w.w;c.height=w.h;
      c.style.background='#0d0f13';c.style.verticalAlign='middle';
      const g=c.getContext('2d');g.strokeStyle='#6ec87a';g.lineWidth=1.5;
      const n=w.values.length,sp=(w.hi-w.lo)||1;g.beginPath();
      for(let i=0;i<n;i++){const x=n>1?i/(n-1)*w.w:0;
        const y=w.h-((w.values[i]-w.lo)/sp)*(w.h-4)-2;
        i?g.lineTo(x,y):g.moveTo(x,y);}
      g.stroke();d.appendChild(c);
      const v=document.createElement('span');
      v.textContent=' '+w.values[n-1].toPrecision(5);d.appendChild(v);}
    else if(w.kind==='button'){const b=document.createElement('button');
      b.textContent=w.label;b.style.background=w.color;
      b.onclick=()=>post(w.id,'value' in w?w.value:true);d.appendChild(b);}
    else if(w.kind==='toggle'){const b=document.createElement('button');
      b.textContent=w.label+(w.value?' ●':' ○');
      b.style.background=w.value?'rgb(40,150,90)':'rgb(70,76,87)';
      b.onclick=()=>post(w.id,!w.value);d.appendChild(b);}
    else if(w.kind==='bar'){const f=(w.value-w.lo)/(w.hi-w.lo||1);
      d.innerHTML=`<span class="lbl">${w.label}</span>`+
      `<span class="bar"><div style="width:${Math.max(0,Math.min(1,f))*100}%">`+
      `</div><span>${w.value.toFixed(3)}</span></span>`;}
    else if(w.kind==='slider'){const s=document.createElement('input');
      s.type='range';s.min=w.lo;s.max=w.hi;s.step=(w.hi-w.lo)/200;s.value=w.value;
      s.oninput=()=>{held=w.id;post(w.id,parseFloat(s.value));};
      s.onchange=()=>{held=null;};
      d.innerHTML=`<span class="lbl">${w.label}</span>`;d.appendChild(s);}
    else if(w.kind==='input'){const s=document.createElement('input');
      s.type='number';s.value=w.value;
      s.onchange=()=>post(w.id,parseFloat(s.value));
      d.innerHTML=`<span class="lbl">${w.label}</span>`;d.appendChild(s);}
    else if(w.kind==='canvas'){const c=document.createElement('canvas');
      c.width=w.w;c.height=w.h;c.style.background='#0d0f13';
      const g=c.getContext('2d');
      const X=x=>x*w.w, Y=y=>(1-y)*w.h;
      for(const s of w.shapes){g.strokeStyle=g.fillStyle=s.color||'#6ec87a';
        g.lineWidth=2;g.beginPath();
        if(s.line){g.moveTo(X(s.line[0]),Y(s.line[1]));
          g.lineTo(X(s.line[2]),Y(s.line[3]));g.stroke();}
        else if(s.circle){g.arc(X(s.circle[0]),Y(s.circle[1]),
          s.circle[2]*w.w,0,2*Math.PI);g.stroke();}
        else if(s.poly){g.moveTo(X(s.poly[0]),Y(s.poly[1]));
          for(let i=2;i<s.poly.length;i+=2)g.lineTo(X(s.poly[i]),Y(s.poly[i+1]));
          g.closePath();g.stroke();}}
      d.appendChild(c);}
    root.appendChild(d);}}
async function tick(){try{const r=await fetch('/frame');
  if(r.ok)render(await r.json());}catch(e){}
  setTimeout(tick,%REFRESH%);}
tick();</script></body></html>"""


class Renderer(InputDevice, OutputDevice):
    """GUI device: input (widget events) and output (state snapshots) in one,
    like the reference Renderer (`gui.jl:53-209`). Attach with a mapping
    whose `extract_output` builds the widget frame (or pass `f_draw`).

    `refresh` is the browser poll period in seconds (the `sync` analog).
    """

    def __init__(self, address="127.0.0.1", port=0, f_draw=None, refresh=0.1):
        self.address = address
        self.port = port
        self.f_draw = f_draw
        self.refresh = refresh
        self._events = queue.Queue()
        self._frame = [text("no frame yet")]
        self._lock = threading.Lock()
        self._server = None
        self._closing = False

    # ------------------------------------------------------------ lifecycle

    def init(self):
        if self._server is not None:  # idempotent: bind once, report port
            return
        gui = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, body, ctype="application/json"):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/":
                    page = _PAGE.replace("%REFRESH%",
                                         str(int(gui.refresh * 1000)))
                    self._send(page.encode(), "text/html")
                elif self.path == "/frame":
                    with gui._lock:
                        body = json.dumps(gui._frame).encode()
                    self._send(body)
                else:
                    self.send_error(404)

            def do_POST(self):
                if self.path == "/event":
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        ev = json.loads(self.rfile.read(n))
                        gui._events.put((ev["id"], ev["value"]))
                    except (ValueError, KeyError):
                        pass  # malformed: tolerate (`iodevices.jl:53-69`)
                    self._send(b"{}")
                else:
                    self.send_error(404)

        self._server = ThreadingHTTPServer((self.address, self.port), Handler)
        self.port = self._server.server_address[1]
        threading.Thread(target=self._server.serve_forever,
                         daemon=True).start()

    def shutdown(self):
        self._closing = True
        if self._server is not None:
            self._server.shutdown()
            self._server = None

    def should_close(self):
        return self._closing

    def interrupt(self):
        self._closing = True
        self._events.put(None)  # unblock get_data

    # ------------------------------------------------------------- IO sides

    def get_data(self):
        """Blocks for the next widget interaction: (widget_id, value)."""
        ev = self._events.get()
        return None if ev is None or self._closing else ev

    def handle_data(self, data):
        """Accept the next frame: either a ready widget list, or a raw
        snapshot run through `f_draw` (one immediate-mode frame,
        `gui.jl:173-209`)."""
        if self.f_draw is not None and not (
                isinstance(data, list) and data
                and isinstance(data[0], dict) and "kind" in data[0]):
            data = self.f_draw(data)
        with self._lock:
            self._frame = list(data)
