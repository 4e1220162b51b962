"""Tkinter GUI: landing page + workspace explorer.

Functional parity with the reference PyQt5 application
(reference application/app.py:18-448): a 1000x700 landing page with a 2x2
grid of clickable workspace thumbnails, and a 1000x800 explorer page with a
clickable floor plan that swaps to the rendered first-person view with four
camera-turn buttons (30-degree steps) and back buttons. PyQt5 isn't a hard
dependency of this framework; `gui_qt` provides the Qt variant when PyQt5
is installed (see main.py backend selection).

Rendering runs on a worker thread so a slow frame never freezes the UI (the
reference renders synchronously on the Qt main thread, app.py:323-347 —
SURVEY.md §7 flags this as a hazard not to replicate).
"""

from __future__ import annotations

import threading
import tkinter as tk
from typing import List, Optional

import numpy as np
from PIL import Image, ImageTk

from nerf_workspaces_explorer_tpu.app.assets import ensure_assets
from nerf_workspaces_explorer_tpu.app.common import CameraViewState, click_to_relative
from nerf_workspaces_explorer_tpu.app.workspace import Workspace, make_workspaces

BG = "#50505a"
BTN_MAIN = {"bg": "#4CAF50", "fg": "white", "relief": tk.FLAT, "padx": 10, "pady": 8}
BTN_CAMERA = {"bg": "#EEC10F", "fg": "white", "relief": tk.FLAT, "padx": 16, "pady": 8}


class LandingPage:
    """2x2 grid of workspace thumbnails (reference app.py:18-106)."""

    def __init__(self, root: tk.Tk, workspaces: Optional[List[Workspace]] = None) -> None:
        self.root = root
        self.workspaces = workspaces if workspaces is not None else make_workspaces()
        root.title("Workspaces Explorer")
        root.geometry("1000x700")
        root.configure(bg=BG)

        self.frame = tk.Frame(root, bg=BG)
        self.frame.pack(expand=True, fill=tk.BOTH)

        tk.Label(
            self.frame,
            text="Please select the workspace to take a detailed tour",
            font=("Arial", 12),
            fg="white",
            bg=BG,
        ).pack(pady=10)

        grid = tk.Frame(self.frame, bg=BG)
        grid.pack(expand=True)
        self._photos = []
        for i, workspace in enumerate(self.workspaces):
            assets = ensure_assets(workspace)
            image = Image.open(assets["thumbnail"])
            image.thumbnail((300, 300))
            photo = ImageTk.PhotoImage(image)
            self._photos.append(photo)
            label = tk.Label(grid, image=photo, bg="#3a3a42", cursor="hand2")
            label.grid(row=(i // 2) * 2, column=i % 2, padx=20, pady=6)
            label.bind("<Button-1>", lambda _e, idx=i: self.open_explorer(idx))
            tk.Label(
                grid, text=workspace.name, font=("Arial", 12), fg="white", bg=BG
            ).grid(row=(i // 2) * 2 + 1, column=i % 2)

    def open_explorer(self, index: int) -> None:
        self.frame.pack_forget()
        WorkspaceExplorer(self.root, self, self.workspaces[index])

    def show_again(self) -> None:
        self.root.geometry("1000x700")
        self.frame.pack(expand=True, fill=tk.BOTH)


class WorkspaceExplorer:
    """Floor-plan click -> rendered view page (reference app.py:109-414)."""

    def __init__(self, root: tk.Tk, landing: LandingPage, workspace: Workspace) -> None:
        self.root = root
        self.landing = landing
        self.workspace = workspace
        self.state = CameraViewState()
        workspace.initialize_models()
        # Pay the preview + full-render compiles here (the model-load step,
        # where a pause is expected) instead of on the first click's main-
        # thread render. Best-effort: a warmup failure must not block the UI.
        try:
            workspace.renderer.warmup()
        except Exception:
            pass

        root.title("Workspace Details")
        root.geometry("1000x800")

        self.frame = tk.Frame(root, bg=BG)
        self.frame.pack(expand=True, fill=tk.BOTH)

        tk.Button(
            self.frame,
            text="Explore another workspace",
            command=self._return_to_landing,
            **BTN_MAIN,
        ).pack(pady=8)

        self._plan_frame = tk.Frame(self.frame, bg=BG)
        self._plan_frame.pack(expand=True, fill=tk.BOTH)
        tk.Label(
            self._plan_frame,
            text=f"Floor plan of the workspace '{workspace.name}'",
            font=("Arial", 12),
            fg="white",
            bg=BG,
        ).pack(pady=4)

        assets = ensure_assets(workspace)
        plan = Image.open(assets["floor_plan"])
        scale_h, scale_w = workspace.floor_plan_scale
        plan = plan.resize((scale_w, scale_h))
        self._plan_photo = ImageTk.PhotoImage(plan)
        self._plan_size = (scale_w, scale_h)
        self._plan_label = tk.Label(self._plan_frame, image=self._plan_photo, bg=BG)
        self._plan_label.pack()
        self._plan_label.bind("<Button-1>", self._plan_clicked)

        tk.Label(
            self._plan_frame,
            text="Click on the image for detailed in-place workspace view",
            font=("Arial", 10),
            fg="white",
            bg=BG,
        ).pack(pady=4)

        self._view_frame: Optional[tk.Frame] = None
        self._view_photo = None

    # ------------------------------------------------------------------ #

    def _plan_clicked(self, event) -> None:
        rel = click_to_relative(
            event.x,
            event.y,
            self._plan_label.winfo_width(),
            self._plan_label.winfo_height(),
            self._plan_size[0],
            self._plan_size[1],
        )
        if rel is None:
            return
        self.state.set_position(*rel)
        self._show_view_page()
        self._request_render()

    def _show_view_page(self) -> None:
        self._plan_frame.pack_forget()
        self._view_frame = tk.Frame(self.frame, bg=BG)
        self._view_frame.pack(expand=True, fill=tk.BOTH)

        self._image_label = tk.Label(self._view_frame, bg=BG, text="Rendering...", fg="white")
        self._image_label.pack(expand=True)

        tk.Label(
            self._view_frame,
            text="Turn camera by clicking buttons bellow",
            font=("Arial", 10),
            fg="white",
            bg=BG,
        ).pack()

        buttons = tk.Frame(self._view_frame, bg=BG)
        buttons.pack(pady=6)
        for text, action in (
            ("←", self.state.turn_left),
            ("→", self.state.turn_right),
            ("↑", self.state.turn_up),
            ("↓", self.state.turn_down),
        ):
            tk.Button(
                buttons,
                text=text,
                command=lambda a=action: self._turn(a),
                **BTN_CAMERA,
            ).pack(side=tk.LEFT, padx=8)

        tk.Button(
            self._view_frame,
            text="Back to Floor Plan",
            command=self._return_to_floor_plan,
            **BTN_MAIN,
        ).pack(pady=8)

    def _turn(self, action) -> None:
        action()
        self._request_render()

    def _request_render(self) -> None:
        """Render on a worker thread; install frames on the UI thread.

        Progressive: a fast single-pass preview lands first, then the full
        hierarchical render replaces it (extension — the reference renders
        the full frame synchronously on the UI thread, app.py:323-347)."""
        args = self.state.render_args()
        self._render_seq = seq = getattr(self, "_render_seq", 0) + 1

        def install_if_current(image):
            if self._render_seq == seq:
                self._install_frame(image)

        def work():
            try:
                preview = self.workspace.render_image_preview(*args)
                self.root.after(0, lambda: install_if_current(preview))
            except Exception:
                pass  # preview is best-effort; the full render still lands
            image = self.workspace.render_image(*args)
            self.root.after(0, lambda: install_if_current(image))

        threading.Thread(target=work, daemon=True).start()

    def _install_frame(self, image: np.ndarray) -> None:
        if self._view_frame is None:
            return
        pil = Image.fromarray(image)
        width = 700
        height = int(pil.height * width / pil.width)
        pil = pil.resize((width, height))
        self._view_photo = ImageTk.PhotoImage(pil)
        self._image_label.configure(image=self._view_photo, text="")

    def _return_to_floor_plan(self) -> None:
        self.state.reset()
        if self._view_frame is not None:
            self._view_frame.destroy()
            self._view_frame = None
        self._plan_frame.pack(expand=True, fill=tk.BOTH)

    def _return_to_landing(self) -> None:
        self.frame.destroy()
        self.landing.show_again()


def run(workspaces: Optional[List[Workspace]] = None) -> None:
    root = tk.Tk()
    LandingPage(root, workspaces)
    root.mainloop()
