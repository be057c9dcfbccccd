// Top-K |IG| feature-importance bars for the inference window covering the
// current playback frame (capability of reference
// FeatureImportanceChart.tsx:19-77, without the recharts dependency).

import { useMemo } from "react";
import type { InferenceItem } from "../types";

interface Props {
  inference: InferenceItem[];
  currentFrame: number;
  topK?: number;
}

function Bars({
  entries,
  color,
  title,
}: {
  entries: { dimension: number; importance: number }[];
  color: string;
  title: string;
}) {
  const max = Math.max(...entries.map((e) => Math.abs(e.importance)), 1e-9);
  return (
    <div className="fi-block">
      <h4>{title}</h4>
      <svg viewBox={`0 0 220 ${entries.length * 18}`} width="100%">
        {entries.map((e, i) => (
          <g key={e.dimension} transform={`translate(0, ${i * 18})`}>
            <text x="0" y="12" fontSize="10" fill="#aab">
              d{e.dimension}
            </text>
            <rect
              x="40"
              y="4"
              height="10"
              width={(Math.abs(e.importance) / max) * 140}
              fill={color}
              opacity={e.importance >= 0 ? 1 : 0.45}
            />
            <text x="185" y="12" fontSize="9" fill="#889">
              {e.importance.toExponential(1)}
            </text>
          </g>
        ))}
      </svg>
    </div>
  );
}

export default function FeatureImportanceChart({
  inference,
  currentFrame,
  topK = 8,
}: Props) {
  // The window whose start frame most recently precedes the playhead.
  const active = useMemo(() => {
    let best: InferenceItem | null = null;
    for (const item of inference) {
      if (item.frame <= currentFrame && (!best || item.frame > best.frame)) {
        best = item;
      }
    }
    return best ?? inference[0] ?? null;
  }, [inference, currentFrame]);

  if (!active?.feature_importance) {
    return <p className="muted">No feature importances (run with explain).</p>;
  }
  return (
    <div className="fi-grid">
      <Bars
        title={`Video features — window @ frame ${active.frame}`}
        entries={active.feature_importance.video.slice(0, topK)}
        color="#49c5e9"
      />
      <Bars
        title={`Audio features — predicted ${active.class}`}
        entries={active.feature_importance.audio.slice(0, topK)}
        color="#e9b949"
      />
    </div>
  );
}
