// SPA bootstrap: mount <App/> under strict mode.
import { StrictMode } from "react";
import { createRoot } from "react-dom/client";
import App from "./App";

const container = document.getElementById("root");
if (!container) {
  throw new Error("missing #root mount point");
}
createRoot(container).render(
  <StrictMode>
    <App />
  </StrictMode>,
);
