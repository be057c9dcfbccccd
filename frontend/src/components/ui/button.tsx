// Button with variants/sizes — capability of the reference's shadcn-style
// button (reference front-end/src/components/ui/button.tsx), without the
// cva/radix dependencies: variants are plain CSS classes in app.css.

import type { ButtonHTMLAttributes } from "react";

export type ButtonVariant = "default" | "outline" | "ghost" | "destructive";
export type ButtonSize = "sm" | "md";

export interface ButtonProps extends ButtonHTMLAttributes<HTMLButtonElement> {
  variant?: ButtonVariant;
  size?: ButtonSize;
}

export default function Button({
  variant = "default",
  size = "md",
  className = "",
  ...rest
}: ButtonProps) {
  return (
    <button
      className={`ui-btn ui-btn-${variant} ui-btn-${size} ${className}`}
      {...rest}
    />
  );
}
