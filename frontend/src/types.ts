// Wire types for the backend contract
// (mmer_tpu/serve/app.py; reference back-end/app/routers/infer.py).

export interface BoundingBox {
  frame: number;
  x1: number;
  y1: number;
  x2: number;
  y2: number;
  confidence: number;
}

export interface ImportanceEntry {
  dimension: number;
  importance: number;
}

export interface InferenceItem {
  class: string;
  frame: number;
  feature_importance?: {
    video: ImportanceEntry[];
    audio: ImportanceEntry[];
  };
}

export interface InferResponse {
  bounding_box: BoundingBox[];
  inference: InferenceItem[];
}

export const EMOTION_COLORS: Record<string, string> = {
  NEU: "#8a8f98",
  HAP: "#e9b949",
  SAD: "#5b8dd9",
  ANG: "#d95b5b",
  FEA: "#9b6dd9",
  DIS: "#5bd98f",
};
