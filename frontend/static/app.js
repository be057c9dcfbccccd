// No-build browser frontend: the same upload → analyze → synchronized
// playback capability as frontend/src/App.tsx (itself a fresh rebuild of
// reference front-end/src/App.tsx:43-142), written as one dependency-free
// ES module so it runs with ZERO toolchain — the backend serves it
// directly (mmer_tpu/serve/app.py GET / and /static/*).  The Vite/React
// tree in frontend/src/ remains the production build for environments
// with node; this file is the in-image servable twin, kept in sync by
// tests/test_frontend_nobuild.py (endpoints, emotion palette, markers).
//
// Behavior mirrored 1:1 with the React app:
//   - /health preflight then POST /infer/?...&explain=true   (App.tsx:75-91)
//   - frame→class forward-fill across windows                (App.tsx:95-109)
//   - canvas bbox overlay, ±1-frame tolerance, fps estimated
//     from annotations                                       (VideoPlayer.tsx)
//   - WebAudio waveform with playhead + click-to-seek        (AudioWaveform.tsx)
//   - top-8 |IG| bars per modality for the active window     (FeatureImportanceChart.tsx)
//   - FLV preview via backend POST /remux/ byte-copy         (lib/api.ts:57-88)
//
// Demo hook: ?demo=<same-origin video url> auto-picks that file and runs
// analyze (plus optional &subchunk=&window=&detect= overrides), so the
// whole flow is drivable headlessly; window.__mmer exposes the state the
// smoke driver asserts on.

const BASE = window.MMER_BACKEND_URL ?? "";

const EMOTION_COLORS = {
  NEU: "#8a8f98",
  HAP: "#e9b949",
  SAD: "#5b8dd9",
  ANG: "#d95b5b",
  FEA: "#9b6dd9",
  DIS: "#5bd98f",
};

// ---- backend client (frontend/src/lib/api.ts) ------------------------

async function checkHealth() {
  try {
    const res = await fetch(`${BASE}/health`);
    if (!res.ok) return false;
    return (await res.json()).status === "ok";
  } catch {
    return false;
  }
}

async function inferVideo(file, opts) {
  const params = new URLSearchParams({
    subchunk_size: String(opts.subchunkSize ?? 32),
    window_size: String(opts.windowSize ?? 5),
    explain: String(opts.explain ?? true),
    detect_every: String(opts.detectEvery ?? 1),
  });
  const form = new FormData();
  form.append("file", file);
  const res = await fetch(`${BASE}/infer/?${params}`, {
    method: "POST",
    body: form,
  });
  if (!res.ok) {
    let detail = res.statusText;
    try {
      detail = (await res.json()).detail ?? detail;
    } catch {
      /* keep statusText */
    }
    throw new Error(`inference failed (${res.status}): ${detail}`);
  }
  return res.json();
}

async function isFlv(file) {
  const b = new Uint8Array(await file.slice(0, 3).arrayBuffer());
  return b[0] === 0x46 && b[1] === 0x4c && b[2] === 0x56; // "FLV"
}

async function remuxFlv(file) {
  try {
    const form = new FormData();
    form.append("file", file);
    const res = await fetch(`${BASE}/remux/`, { method: "POST", body: form });
    if (!res.ok) return null;
    return await res.blob();
  } catch {
    return null;
  }
}

// ---- state ------------------------------------------------------------

const state = {
  file: null,
  videoUrl: "",
  result: null,
  frameToClass: new Map(),
  boxesByFrame: new Map(),
  maxFrame: 0,
  time: 0,
  duration: 0,
  busy: false,
  pickToken: 0,
};
window.__mmer = state; // inspection hook for the headless smoke driver

const $ = (id) => document.getElementById(id);

function setPreviewUrl(url) {
  if (state.videoUrl) URL.revokeObjectURL(state.videoUrl);
  state.videoUrl = url;
  const video = $("video");
  video.src = url;
  $("player-wrap").hidden = !url;
  $("waveform").hidden = !url;
  if (url) loadWaveform(url);
}

// ---- analyze flow (App.tsx:75-116) -------------------------------------

async function onPick(f) {
  const token = ++state.pickToken;
  state.file = f;
  state.result = null;
  renderResult();
  $("flv-notice").hidden = true;
  if (!f) {
    setPreviewUrl("");
    return;
  }
  setPreviewUrl(URL.createObjectURL(f));
  if (await isFlv(f)) {
    // The reference transcodes FLV in-browser with ffmpeg.wasm; here the
    // backend converts (POST /remux/). Notice only when that fails (415).
    const mp4 = await remuxFlv(f);
    if (token !== state.pickToken) return; // stale pick — drop it
    if (mp4) setPreviewUrl(URL.createObjectURL(mp4));
    else $("flv-notice").hidden = false;
  }
}

async function analyze(extra = {}) {
  if (!state.file || state.busy) return;
  state.busy = true;
  $("analyze").disabled = true;
  $("analyze").textContent = "Analyzing…";
  $("error-dialog").hidden = true;
  try {
    if (!(await checkHealth())) {
      throw new Error("backend is not reachable (/health failed)");
    }
    state.result = await inferVideo(state.file, {
      explain: true,
      windowSize: Number($("window-size").value),
      detectEvery: Number($("detect-every").value),
      ...extra,
    });
    indexResult();
  } catch (e) {
    $("error-text").textContent = e instanceof Error ? e.message : String(e);
    $("error-dialog").hidden = false;
  } finally {
    state.busy = false;
    $("analyze").disabled = !state.file;
    $("analyze").textContent = "Analyze";
    renderResult();
  }
}

// Forward-fill: each window's class holds until the next window's start
// frame (App.tsx:95-109 / reference App.tsx:87-109).
function indexResult() {
  const r = state.result;
  state.frameToClass = new Map();
  state.boxesByFrame = new Map();
  state.maxFrame = 0;
  if (!r) return;
  for (const b of r.bounding_box) {
    state.maxFrame = Math.max(state.maxFrame, b.frame);
    const list = state.boxesByFrame.get(b.frame) ?? [];
    list.push(b);
    state.boxesByFrame.set(b.frame, list);
  }
  const items = [...r.inference].sort((a, b) => a.frame - b.frame);
  for (let i = 0; i < items.length; i++) {
    const from = items[i].frame;
    const to = i + 1 < items.length ? items[i + 1].frame : state.maxFrame + 1;
    for (let f = from; f < to; f++) state.frameToClass.set(f, items[i].class);
  }
}

function fps() {
  return state.duration > 0 && state.maxFrame > 0
    ? (state.maxFrame + 1) / state.duration
    : 30;
}

// ---- video overlay (VideoPlayer.tsx) -----------------------------------

function drawOverlay() {
  const video = $("video");
  const canvas = $("overlay");
  const ctx = canvas.getContext("2d");
  canvas.width = video.clientWidth;
  canvas.height = video.clientHeight;
  ctx.clearRect(0, 0, canvas.width, canvas.height);
  if (!video.duration || state.maxFrame === 0 || !video.videoWidth) return;
  const f = Math.round(video.currentTime * ((state.maxFrame + 1) / video.duration));
  const candidates =
    state.boxesByFrame.get(f) ??
    state.boxesByFrame.get(f - 1) ??
    state.boxesByFrame.get(f + 1); // ±1 frame tolerance
  if (!candidates) return;
  const sx = canvas.width / video.videoWidth;
  const sy = canvas.height / video.videoHeight;
  const label = state.frameToClass.get(f) ?? "";
  const color = EMOTION_COLORS[label] ?? "#49c5e9";
  for (const b of candidates) {
    const x = b.x1 * sx;
    const y = b.y1 * sy;
    ctx.strokeStyle = color;
    ctx.lineWidth = 2;
    ctx.strokeRect(x, y, (b.x2 - b.x1) * sx, (b.y2 - b.y1) * sy);
    if (label) {
      ctx.font = "14px system-ui";
      const text = `${label} ${(b.confidence * 100).toFixed(0)}%`;
      const tw = ctx.measureText(text).width + 8;
      ctx.fillStyle = color;
      ctx.fillRect(x, Math.max(0, y - 20), tw, 20);
      ctx.fillStyle = "#fff";
      ctx.fillText(text, x + 4, Math.max(14, y - 5));
    }
  }
}

// ---- waveform (AudioWaveform.tsx) ---------------------------------------

let peaks = null;

async function loadWaveform(src) {
  peaks = null;
  try {
    const buf = await (await fetch(src)).arrayBuffer();
    const actx = new AudioContext();
    const audio = await actx.decodeAudioData(buf);
    const data = audio.getChannelData(0);
    const bins = 600;
    const step = Math.max(1, Math.floor(data.length / bins));
    peaks = new Float32Array(bins);
    for (let i = 0; i < bins; i++) {
      let peak = 0;
      for (let j = i * step; j < Math.min((i + 1) * step, data.length); j++) {
        peak = Math.max(peak, Math.abs(data[j]));
      }
      peaks[i] = peak;
    }
    void actx.close();
  } catch {
    peaks = null; // container without decodable audio
  }
  drawWaveform();
}

function drawWaveform() {
  const canvas = $("waveform");
  const ctx = canvas.getContext("2d");
  const { width, height } = canvas;
  ctx.clearRect(0, 0, width, height);
  if (!peaks) {
    ctx.fillStyle = "#666";
    ctx.font = "12px system-ui";
    ctx.fillText("no decodable audio track", 8, height / 2);
    return;
  }
  const mid = height / 2;
  const barW = width / peaks.length;
  const playedX = state.duration > 0 ? (state.time / state.duration) * width : 0;
  for (let i = 0; i < peaks.length; i++) {
    const x = i * barW;
    const h = Math.max(1, peaks[i] * (height - 4));
    ctx.fillStyle = x <= playedX ? "#49c5e9" : "#3a4150";
    ctx.fillRect(x, mid - h / 2, Math.max(1, barW - 1), h);
  }
  ctx.fillStyle = "#e9e9e9";
  ctx.fillRect(playedX, 0, 1.5, height);
}

// ---- results: chips + feature-importance bars ---------------------------

function hbars(containerId, title, entries, color) {
  const el = $(containerId);
  const max = entries.reduce((a, e) => Math.max(a, e.value), 0) || 1;
  // title/labels carry backend-supplied strings (e.g. the predicted class)
  // — built with textContent, not interpolated into innerHTML (ADVICE r4).
  el.innerHTML = "";
  const h = document.createElement("h4");
  h.textContent = title;
  el.appendChild(h);
  const span = (cls, text) => {
    const s = document.createElement("span");
    s.className = cls;
    if (text !== undefined) s.textContent = text;
    return s;
  };
  for (const e of entries) {
    const row = document.createElement("div");
    row.className = "hbar-row";
    row.appendChild(span("hbar-label", e.label));
    const track = span("hbar-track");
    const fill = span("hbar-fill");
    fill.style.width = `${(100 * e.value) / max}%`;
    fill.style.background = color;
    track.appendChild(fill);
    row.appendChild(track);
    row.appendChild(span("hbar-value", e.value.toExponential(2)));
    el.appendChild(row);
  }
}

function renderImportance() {
  const r = state.result;
  if (!r) return;
  const frame = Math.round(state.time * fps());
  // The window whose start frame most recently precedes the playhead.
  let active = null;
  for (const item of r.inference) {
    if (item.frame <= frame && (!active || item.frame > active.frame)) {
      active = item;
    }
  }
  active = active ?? r.inference[0] ?? null;
  if (!active?.feature_importance) {
    $("fi-none").hidden = false;
    $("fi-grid").hidden = true;
    return;
  }
  $("fi-none").hidden = true;
  $("fi-grid").hidden = false;
  const top = (rows) =>
    rows.slice(0, 8).map((e) => ({ label: `d${e.dimension}`, value: e.importance }));
  hbars("fi-video", `Video features — window @ frame ${active.frame}`,
        top(active.feature_importance.video), "#49c5e9");
  hbars("fi-audio", `Audio features — predicted ${active.class}`,
        top(active.feature_importance.audio), "#e9b949");
}

function renderResult() {
  const r = state.result;
  $("results").hidden = !r;
  $("fi-card").hidden = !r;
  if (!r) return;
  const chips = $("chips");
  chips.innerHTML = "";
  for (const item of r.inference) {
    const chip = document.createElement("button");
    chip.className = "chip";
    chip.style.borderColor = EMOTION_COLORS[item.class] ?? "#3a4150";
    chip.title = `seek to frame ${item.frame}`;
    // Backend-supplied strings (item.class) go through textContent, never
    // innerHTML — same injection posture as the React twin (ADVICE r4).
    const dot = document.createElement("span");
    dot.className = "dot";
    dot.style.background = EMOTION_COLORS[item.class] ?? "#8a8f98";
    chip.appendChild(dot);
    chip.appendChild(
      document.createTextNode(`${item.class} @ ${item.frame}`),
    );
    chip.addEventListener("click", () => seekTo(item.frame / fps()));
    chips.appendChild(chip);
  }
  renderImportance();
}

// ---- shared clock wiring ------------------------------------------------

function seekTo(t) {
  const video = $("video");
  if (Math.abs(video.currentTime - t) > 0.25) video.currentTime = t;
  state.time = t;
  drawWaveform();
  renderImportance();
}

function wire() {
  $("file").addEventListener("change", (e) =>
    onPick(e.target.files?.[0] ?? null).then(() => {
      $("analyze").disabled = !state.file;
    }),
  );
  $("analyze").addEventListener("click", () => analyze());
  $("error-close").addEventListener("click", () => {
    $("error-dialog").hidden = true;
  });
  const video = $("video");
  video.addEventListener("timeupdate", () => {
    state.time = video.currentTime;
    state.duration = video.duration || 0;
    drawOverlay();
    drawWaveform();
    renderImportance();
  });
  video.addEventListener("loadedmetadata", () => {
    state.duration = video.duration || 0;
    drawOverlay();
  });
  video.addEventListener("seeked", drawOverlay);
  setInterval(drawOverlay, 66); // smooth overlay between timeupdates
  $("waveform").addEventListener("click", (e) => {
    const rect = e.currentTarget.getBoundingClientRect();
    const frac = (e.clientX - rect.left) / rect.width;
    if (state.duration > 0) seekTo(frac * state.duration);
  });
}

// ---- demo autopilot -----------------------------------------------------

async function maybeRunDemo() {
  const q = new URLSearchParams(location.search);
  const src = q.get("demo");
  if (!src) return;
  // Same-origin only: a crafted ?demo= link must not make the page fetch
  // an arbitrary cross-origin resource and POST it to /infer (ADVICE r4).
  if (new URL(src, location.href).origin !== location.origin) {
    throw new Error(`demo source must be same-origin: ${src}`);
  }
  const resp = await fetch(src);
  if (!resp.ok) throw new Error(`demo fetch failed: HTTP ${resp.status}`);
  const blob = await resp.blob();
  const file = new File([blob], src.split("/").pop() || "demo.mp4", {
    type: "video/mp4",
  });
  await onPick(file);
  $("analyze").disabled = false;
  await analyze({
    subchunkSize: Number(q.get("subchunk") ?? 32),
    windowSize: Number(q.get("window") ?? $("window-size").value),
    detectEvery: Number(q.get("detect") ?? $("detect-every").value),
  });
  // Park the playhead mid-clip so the overlay/chart render deterministically.
  const video = $("video");
  video.currentTime = (video.duration || 0) / 2;
  // Done only on SUCCESS: analyze() swallows failures into the error
  // dialog, so a headless driver asserting __mmer.demoDone must not pass
  // on a failed inference (ADVICE r4).
  state.demoDone = !!state.result;
}

wire();
maybeRunDemo().catch((e) => {
  $("error-text").textContent = e instanceof Error ? e.message : String(e);
  $("error-dialog").hidden = false;
});
