// Card primitives — capability of the reference's shadcn-style card
// (reference front-end/src/components/ui/card.tsx), plain CSS.

import type { HTMLAttributes, ReactNode } from "react";

function block(cls: string) {
  return function Block({
    className = "",
    children,
    ...rest
  }: HTMLAttributes<HTMLDivElement> & { children?: ReactNode }) {
    return (
      <div className={`${cls} ${className}`} {...rest}>
        {children}
      </div>
    );
  };
}

export const Card = block("ui-card");
export const CardHeader = block("ui-card-header");
export const CardContent = block("ui-card-content");
export const CardFooter = block("ui-card-footer");

export function CardTitle({
  className = "",
  children,
}: {
  className?: string;
  children?: ReactNode;
}) {
  return <h3 className={`ui-card-title ${className}`}>{children}</h3>;
}

export function CardDescription({
  className = "",
  children,
}: {
  className?: string;
  children?: ReactNode;
}) {
  return <p className={`ui-card-desc muted ${className}`}>{children}</p>;
}
