// Top-K |IG| feature-importance bars for the inference window covering the
// current playback frame (capability of reference
// FeatureImportanceChart.tsx:19-77, without the recharts dependency).

import { useMemo } from "react";
import type { InferenceItem } from "../types";
import { HBarList } from "./ui";

interface Props {
  inference: InferenceItem[];
  currentFrame: number;
  topK?: number;
}

function toEntries(rows: { dimension: number; importance: number }[]) {
  return rows.map((e) => ({ label: `d${e.dimension}`, value: e.importance }));
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
      <HBarList
        title={`Video features — window @ frame ${active.frame}`}
        entries={toEntries(active.feature_importance.video.slice(0, topK))}
        color="#49c5e9"
      />
      <HBarList
        title={`Audio features — predicted ${active.class}`}
        entries={toEntries(active.feature_importance.audio.slice(0, topK))}
        color="#e9b949"
      />
    </div>
  );
}
