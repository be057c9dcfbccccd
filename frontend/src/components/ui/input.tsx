// Input + Label — capability of the reference's ui/input.tsx + ui/label.tsx.

import type {
  InputHTMLAttributes,
  LabelHTMLAttributes,
  ReactNode,
} from "react";

export function Input({
  className = "",
  ...rest
}: InputHTMLAttributes<HTMLInputElement>) {
  return <input className={`ui-input ${className}`} {...rest} />;
}

export function Label({
  className = "",
  children,
  ...rest
}: LabelHTMLAttributes<HTMLLabelElement> & { children?: ReactNode }) {
  return (
    <label className={`ui-label ${className}`} {...rest}>
      {children}
    </label>
  );
}
