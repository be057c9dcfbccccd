// Select — capability of the reference's radix-based ui/select.tsx via the
// native <select>, which keeps keyboard/a11y behavior for free.

import type { ReactNode, SelectHTMLAttributes } from "react";
import { ChevronDownIcon } from "./icons";

export interface SelectProps
  extends SelectHTMLAttributes<HTMLSelectElement> {
  options: { value: string; label: ReactNode }[];
}

export default function Select({
  options,
  className = "",
  ...rest
}: SelectProps) {
  return (
    <span className={`ui-select-wrap ${className}`}>
      <select className="ui-select" {...rest}>
        {options.map((o) => (
          <option key={o.value} value={o.value}>
            {o.label}
          </option>
        ))}
      </select>
      <ChevronDownIcon className="ui-select-chevron" />
    </span>
  );
}
