// Backend client. BASE resolves to the nginx /api prefix in production
// (deploy/nginx.conf) or the Vite dev proxy locally; VITE_BACKEND_URL
// overrides both (reference App.tsx:55 uses the same env var).

import type { InferResponse } from "../types";

const BASE: string =
  (import.meta as any).env?.VITE_BACKEND_URL ?? "/api";

export async function checkHealth(): Promise<boolean> {
  try {
    const res = await fetch(`${BASE}/health`);
    if (!res.ok) return false;
    const body = await res.json();
    return body.status === "ok";
  } catch {
    return false;
  }
}

export interface InferOptions {
  subchunkSize?: number;
  windowSize?: number;
  explain?: boolean;
  /** run the face detector every Nth frame, carrying boxes forward */
  detectEvery?: number;
}

export async function inferVideo(
  file: File,
  opts: InferOptions = {},
): Promise<InferResponse> {
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
  return (await res.json()) as InferResponse;
}

// FLV uploads: the reference transcodes FLV→MP4 in-browser with ffmpeg.wasm
// through a copy→libx264→mpeg4 fallback chain (reference
// VideoPlayer.tsx:336-441).  This build keeps the wasm bundle out of the
// critical path and mirrors the chain server-side (POST /remux/):
// H.264 + AAC/MP3 FLVs are byte-copied into MP4 (serve/remux.py); other
// video codecs (Sorenson/FLV1, VP6) get a cv2 mp4v transcode with the
// audio track still byte-copied when it is AAC/MP3 (serve/transcode.py).
// Only when both routes fail does the backend answer 415 and the player
// show a notice; inference always runs server-side regardless.
export function isFlv(file: File): Promise<boolean> {
  return file
    .slice(0, 3)
    .arrayBuffer()
    .then((buf) => {
      const b = new Uint8Array(buf);
      return b[0] === 0x46 && b[1] === 0x4c && b[2] === 0x56; // "FLV"
    });
}

// FLV → playable MP4 via the backend copy-remux; null when the FLV's
// codecs require a real transcode (HTTP 415) or the backend is down.
export async function remuxFlv(file: File): Promise<Blob | null> {
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
