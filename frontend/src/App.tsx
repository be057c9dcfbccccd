// Upload → analyze → synchronized playback UI (capability of reference
// App.tsx:43-142): health preflight, POST /infer/?explain=true, frame→class
// forward-fill, bbox overlay, waveform, per-window importance chart, and a
// per-window results strip.

import { useCallback, useMemo, useRef, useState } from "react";
import AudioWaveform from "./components/AudioWaveform";
import FeatureImportanceChart from "./components/FeatureImportanceChart";
import VideoPlayer from "./components/VideoPlayer";
import {
  Button,
  Card,
  CardContent,
  CardHeader,
  CardTitle,
  Dialog,
  Input,
  Label,
  LoaderIcon,
  Select,
} from "./components/ui";
import { checkHealth, inferVideo, isFlv, remuxFlv } from "./lib/api";
import type { InferResponse } from "./types";
import { EMOTION_COLORS } from "./types";
import "./app.css";

export default function App() {
  const [file, setFile] = useState<File | null>(null);
  const [videoUrl, setVideoUrl] = useState<string>("");
  const [flvNotice, setFlvNotice] = useState(false);
  const [busy, setBusy] = useState(false);
  const [error, setError] = useState<string>("");
  const [result, setResult] = useState<InferResponse | null>(null);
  const [time, setTime] = useState(0);
  const [duration, setDuration] = useState(0);
  const [windowSize, setWindowSize] = useState(5);
  const [detectEvery, setDetectEvery] = useState(1);
  // Monotonic pick token: a slow FLV remux that resolves after the user
  // picked another file must not clobber the newer selection's preview.
  const pickRef = useRef(0);

  const setPreviewUrl = useCallback((url: string) => {
    setVideoUrl((prev) => {
      if (prev) URL.revokeObjectURL(prev);
      return url;
    });
  }, []);

  const onPick = useCallback(
    async (f: File | null) => {
      const token = ++pickRef.current;
      setFile(f);
      setResult(null);
      setError("");
      setFlvNotice(false);
      if (f) {
        setPreviewUrl(URL.createObjectURL(f));
        // The reference transcodes FLV in-browser via ffmpeg.wasm; here the
        // backend converts (POST /remux/): H.264+AAC/MP3 by byte copy,
        // other video codecs via cv2 mp4v transcode. Notice only when
        // both routes fail (415).
        if (await isFlv(f)) {
          const mp4 = await remuxFlv(f);
          if (token !== pickRef.current) return; // stale pick — drop it
          if (mp4) setPreviewUrl(URL.createObjectURL(mp4));
          else setFlvNotice(true);
        }
      } else {
        setPreviewUrl("");
      }
    },
    [setPreviewUrl],
  );

  const analyze = useCallback(async () => {
    if (!file) return;
    setBusy(true);
    setError("");
    try {
      if (!(await checkHealth())) {
        throw new Error("backend is not reachable (/health failed)");
      }
      setResult(
        await inferVideo(file, { explain: true, windowSize, detectEvery }),
      );
    } catch (e) {
      setError(e instanceof Error ? e.message : String(e));
    } finally {
      setBusy(false);
    }
  }, [file, windowSize, detectEvery]);

  // Forward-fill: each window's class holds until the next window's start
  // frame (reference App.tsx:87-109).
  const frameToClass = useMemo(() => {
    const m = new Map<number, string>();
    if (!result) return m;
    const items = [...result.inference].sort((a, b) => a.frame - b.frame);
    const maxFrame = result.bounding_box.reduce(
      (acc, b) => Math.max(acc, b.frame),
      0,
    );
    for (let i = 0; i < items.length; i++) {
      const from = items[i].frame;
      const to = i + 1 < items.length ? items[i + 1].frame : maxFrame + 1;
      for (let f = from; f < to; f++) m.set(f, items[i].class);
    }
    return m;
  }, [result]);

  const maxFrame = useMemo(
    () => result?.bounding_box.reduce((a, b) => Math.max(a, b.frame), 0) ?? 0,
    [result],
  );
  const fps = duration > 0 && maxFrame > 0 ? (maxFrame + 1) / duration : 30;
  const currentFrame = Math.round(time * fps);

  return (
    <main>
      <h1>Multi-Modal Emotion Recognition</h1>
      <p className="muted">
        Upload a video; the backend detects faces, embeds video + audio, and
        classifies the emotion per sliding window.
      </p>

      <section className="controls">
        <Input
          type="file"
          accept="video/*,.flv"
          onChange={(e) => void onPick(e.target.files?.[0] ?? null)}
        />
        <Label htmlFor="window-size">Window</Label>
        <Select
          id="window-size"
          value={String(windowSize)}
          onChange={(e) => setWindowSize(Number(e.target.value))}
          options={[1, 2, 3, 4, 5].map((n) => ({
            value: String(n),
            label: `${n} subchunk${n > 1 ? "s" : ""}`,
          }))}
        />
        <Label htmlFor="detect-every">Detect</Label>
        <Select
          id="detect-every"
          value={String(detectEvery)}
          onChange={(e) => setDetectEvery(Number(e.target.value))}
          options={[1, 2, 3, 5].map((n) => ({
            value: String(n),
            label: n === 1 ? "every frame" : `every ${n} frames`,
          }))}
        />
        <Button disabled={!file || busy} onClick={() => void analyze()}>
          {busy && <LoaderIcon className="spin" />}
          {busy ? "Analyzing…" : "Analyze"}
        </Button>
      </section>

      {flvNotice && (
        <p className="notice">
          FLV container with codecs the backend cannot remux for preview:
          inference still runs server-side as usual.
        </p>
      )}
      <Dialog
        open={!!error}
        onClose={() => setError("")}
        title="Inference failed"
      >
        <p className="error">{error}</p>
      </Dialog>

      {videoUrl && (
        <VideoPlayer
          src={videoUrl}
          boxes={result?.bounding_box ?? []}
          frameToClass={frameToClass}
          currentTime={time}
          onTimeUpdate={(t, d) => {
            setTime(t);
            if (d) setDuration(d);
          }}
        />
      )}

      {videoUrl && (
        <AudioWaveform
          src={videoUrl}
          currentTime={time}
          duration={duration}
          onSeek={setTime}
        />
      )}

      {result && (
        <>
          <Card className="results">
            <CardHeader>
              <CardTitle>Windows</CardTitle>
            </CardHeader>
            <CardContent>
              <div className="chips">
                {result.inference.map((item, i) => (
                  <button
                    key={i}
                    className="chip"
                    style={{ borderColor: EMOTION_COLORS[item.class] }}
                    onClick={() => setTime(item.frame / fps)}
                    title={`seek to frame ${item.frame}`}
                  >
                    <span
                      className="dot"
                      style={{ background: EMOTION_COLORS[item.class] }}
                    />
                    {item.class} @ {item.frame}
                  </button>
                ))}
              </div>
            </CardContent>
          </Card>
          <Card>
            <CardHeader>
              <CardTitle>Feature importance (Integrated Gradients)</CardTitle>
            </CardHeader>
            <CardContent>
              <FeatureImportanceChart
                inference={result.inference}
                currentFrame={currentFrame}
              />
            </CardContent>
          </Card>
        </>
      )}
    </main>
  );
}
