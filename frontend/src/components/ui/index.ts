// UI kit surface — mirrors the reference's shadcn-style component set
// (reference front-end/src/components/ui/index.ts: button, card, input,
// label, select, dialog, alert-dialog, chart, icons) as dependency-free
// React + plain-CSS equivalents.

export { default as Button } from "./button";
export type { ButtonProps, ButtonSize, ButtonVariant } from "./button";
export {
  Card,
  CardContent,
  CardDescription,
  CardFooter,
  CardHeader,
  CardTitle,
} from "./card";
export { Input, Label } from "./input";
export { default as Select } from "./select";
export type { SelectProps } from "./select";
export { AlertDialog, Dialog } from "./dialog";
export type { AlertDialogProps, DialogProps } from "./dialog";
export { default as HBarList } from "./chart";
export type { HBarEntry, HBarListProps } from "./chart";
export {
  ChevronDownIcon,
  LoaderIcon,
  PauseIcon,
  PlayIcon,
  UploadIcon,
  XIcon,
} from "./icons";
