// Video playback with a canvas bounding-box overlay synchronized to the
// current frame (capability of reference VideoPlayer.tsx: annotation lookup
// with ±1-frame tolerance, FPS estimated from the annotations when the
// container doesn't expose it, labeled boxes redrawn on timeupdate).

import { useEffect, useMemo, useRef } from "react";
import type { BoundingBox } from "../types";
import { EMOTION_COLORS } from "../types";

interface Props {
  src: string;
  boxes: BoundingBox[];
  frameToClass: Map<number, string>;
  currentTime: number;
  onTimeUpdate: (t: number, duration: number) => void;
}

export default function VideoPlayer({
  src,
  boxes,
  frameToClass,
  currentTime,
  onTimeUpdate,
}: Props) {
  const videoRef = useRef<HTMLVideoElement>(null);
  const canvasRef = useRef<HTMLCanvasElement>(null);

  const byFrame = useMemo(() => {
    const m = new Map<number, BoundingBox[]>();
    for (const b of boxes) {
      const list = m.get(b.frame) ?? [];
      list.push(b);
      m.set(b.frame, list);
    }
    return m;
  }, [boxes]);

  const maxFrame = useMemo(
    () => boxes.reduce((acc, b) => Math.max(acc, b.frame), 0),
    [boxes],
  );

  // External seek (waveform / chart clicks drive the shared clock).
  useEffect(() => {
    const v = videoRef.current;
    if (v && Math.abs(v.currentTime - currentTime) > 0.25) {
      v.currentTime = currentTime;
    }
  }, [currentTime]);

  useEffect(() => {
    const video = videoRef.current;
    const canvas = canvasRef.current;
    if (!video || !canvas) return;

    const draw = () => {
      const ctx = canvas.getContext("2d");
      if (!ctx) return;
      canvas.width = video.clientWidth;
      canvas.height = video.clientHeight;
      ctx.clearRect(0, 0, canvas.width, canvas.height);
      if (!video.duration || maxFrame === 0) return;

      // FPS from annotations when metadata lacks it (reference
      // VideoPlayer.tsx:158-171 does the same maxFrame/duration estimate).
      const fps = (maxFrame + 1) / video.duration;
      const frame = Math.round(video.currentTime * fps);

      // ±1 frame tolerance lookup.
      const candidates =
        byFrame.get(frame) ?? byFrame.get(frame - 1) ?? byFrame.get(frame + 1);
      if (!candidates) return;

      const sx = canvas.width / video.videoWidth;
      const sy = canvas.height / video.videoHeight;
      const label = frameToClass.get(frame) ?? "";
      const color = EMOTION_COLORS[label] ?? "#49c5e9";
      for (const b of candidates) {
        const x = b.x1 * sx;
        const y = b.y1 * sy;
        const w = (b.x2 - b.x1) * sx;
        const h = (b.y2 - b.y1) * sy;
        ctx.strokeStyle = color;
        ctx.lineWidth = 2;
        ctx.strokeRect(x, y, w, h);
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
    };

    const onTime = () => {
      draw();
      onTimeUpdate(video.currentTime, video.duration || 0);
    };
    video.addEventListener("timeupdate", onTime);
    video.addEventListener("seeked", draw);
    video.addEventListener("loadedmetadata", draw);
    const raf = setInterval(draw, 66); // smooth overlay between timeupdates
    return () => {
      video.removeEventListener("timeupdate", onTime);
      video.removeEventListener("seeked", draw);
      video.removeEventListener("loadedmetadata", draw);
      clearInterval(raf);
    };
  }, [byFrame, frameToClass, maxFrame, onTimeUpdate]);

  return (
    <div className="player-wrap">
      <video ref={videoRef} src={src} controls playsInline />
      <canvas ref={canvasRef} className="overlay" />
    </div>
  );
}
