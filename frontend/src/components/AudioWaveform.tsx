// Audio waveform with playhead + click-to-seek, implemented directly on
// WebAudio + canvas (the reference pulls in wavesurfer.js for the same
// capability, reference AudioWaveform.tsx:18-59).

import { useEffect, useRef, useState } from "react";

interface Props {
  src: string;
  currentTime: number;
  duration: number;
  onSeek: (t: number) => void;
}

export default function AudioWaveform({
  src,
  currentTime,
  duration,
  onSeek,
}: Props) {
  const canvasRef = useRef<HTMLCanvasElement>(null);
  const [peaks, setPeaks] = useState<Float32Array | null>(null);

  useEffect(() => {
    let cancelled = false;
    (async () => {
      try {
        const res = await fetch(src);
        const buf = await res.arrayBuffer();
        const ctx = new AudioContext();
        const audio = await ctx.decodeAudioData(buf);
        const data = audio.getChannelData(0);
        const bins = 600;
        const step = Math.max(1, Math.floor(data.length / bins));
        const out = new Float32Array(bins);
        for (let i = 0; i < bins; i++) {
          let peak = 0;
          for (let j = i * step; j < Math.min((i + 1) * step, data.length); j++) {
            peak = Math.max(peak, Math.abs(data[j]));
          }
          out[i] = peak;
        }
        if (!cancelled) setPeaks(out);
        void ctx.close();
      } catch {
        if (!cancelled) setPeaks(null); // container without decodable audio
      }
    })();
    return () => {
      cancelled = true;
    };
  }, [src]);

  useEffect(() => {
    const canvas = canvasRef.current;
    if (!canvas) return;
    const ctx = canvas.getContext("2d");
    if (!ctx) return;
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
    const playedX = duration > 0 ? (currentTime / duration) * width : 0;
    for (let i = 0; i < peaks.length; i++) {
      const x = i * barW;
      const h = Math.max(1, peaks[i] * (height - 4));
      ctx.fillStyle = x <= playedX ? "#49c5e9" : "#3a4150";
      ctx.fillRect(x, mid - h / 2, Math.max(1, barW - 1), h);
    }
    ctx.fillStyle = "#e9e9e9";
    ctx.fillRect(playedX, 0, 1.5, height);
  }, [peaks, currentTime, duration]);

  return (
    <canvas
      ref={canvasRef}
      className="waveform"
      width={600}
      height={80}
      onClick={(e) => {
        const rect = e.currentTarget.getBoundingClientRect();
        const frac = (e.clientX - rect.left) / rect.width;
        if (duration > 0) onSeek(frac * duration);
      }}
    />
  );
}
