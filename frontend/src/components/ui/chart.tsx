// Horizontal bar-list chart primitive — capability of the reference's
// recharts-based ui/chart.tsx wrapper as a dependency-free SVG component.
// Used by FeatureImportanceChart for the per-modality |IG| bars.

export interface HBarEntry {
  label: string;
  value: number;
  display?: string;
}

export interface HBarListProps {
  entries: HBarEntry[];
  color: string;
  title?: string;
  width?: number;
  rowHeight?: number;
  labelWidth?: number;
}

export default function HBarList({
  entries,
  color,
  title,
  width = 220,
  rowHeight = 18,
  labelWidth = 40,
}: HBarListProps) {
  const max = Math.max(...entries.map((e) => Math.abs(e.value)), 1e-9);
  const barSpan = width - labelWidth - 40;
  return (
    <div className="fi-block">
      {title && <h4>{title}</h4>}
      <svg viewBox={`0 0 ${width} ${entries.length * rowHeight}`} width="100%">
        {entries.map((e, i) => (
          <g key={e.label} transform={`translate(0, ${i * rowHeight})`}>
            <text x="0" y="12" fontSize="10" fill="#aab">
              {e.label}
            </text>
            <rect
              x={labelWidth}
              y="4"
              height="10"
              width={(Math.abs(e.value) / max) * barSpan}
              fill={color}
              opacity={e.value >= 0 ? 1 : 0.45}
            />
            <text x={width - 35} y="12" fontSize="9" fill="#889">
              {e.display ?? e.value.toExponential(1)}
            </text>
          </g>
        ))}
      </svg>
    </div>
  );
}
