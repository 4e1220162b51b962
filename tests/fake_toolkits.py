"""Duck-typed fake GUI toolkits so the real GUI modules execute headless.

This environment has no display, no Xvfb, and no PyQt5 wheels (zero
egress), so `app/gui_qt.py` and `app/gui_tk.py` cannot run against the
real toolkits here (probed 2026-08-17: `pip download PyQt5` finds no
distribution; `tkinter.Tk()` raises TclError without $DISPLAY). These
fakes implement exactly the toolkit surface those modules touch —
widgets, layouts, signals, pixmaps, event objects — so the *real* GUI
code (the reference-parity flows of application/app.py:18-448) executes
under pytest: construction, layout, click handlers, progressive
rendering, and the page-swap logic all run for real; only the pixels on
a screen are faked.

Used by tests/test_gui_exec.py. Not a test module itself.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Callable, Dict, List, Optional, Tuple


# --------------------------------------------------------------------- #
# Fake Qt (PyQt5)
# --------------------------------------------------------------------- #


class _BoundSignal:
    def __init__(self) -> None:
        self._slots: List[Callable] = []

    def connect(self, slot: Callable) -> None:
        self._slots.append(slot)

    def emit(self, *args) -> None:
        for slot in list(self._slots):
            slot(*args)


class pyqtSignal:
    """Class-attribute signal descriptor (per-instance bound signals)."""

    def __init__(self, *types_) -> None:
        self._name = "signal"

    def __set_name__(self, owner, name) -> None:
        self._name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        key = "_fake_signal_" + self._name
        if key not in obj.__dict__:
            obj.__dict__[key] = _BoundSignal()
        return obj.__dict__[key]


class _QtNamespace:
    AlignLeft = 0x1
    AlignRight = 0x2
    AlignCenter = 0x4
    AlignTop = 0x20
    AlignBottom = 0x40


class QSize:
    def __init__(self, w: int, h: int) -> None:
        self._w, self._h = int(w), int(h)

    def width(self) -> int:
        return self._w

    def height(self) -> int:
        return self._h


class QColor:
    def __init__(self, *rgb) -> None:
        self.rgb = rgb


class QFont:
    def __init__(self, family: str = "", size: int = 0) -> None:
        self.family, self.size = family, size


class QImage:
    Format_RGB888 = object()

    def __init__(self, data, width, height, stride, fmt) -> None:
        self.data, self._w, self._h = bytes(data), int(width), int(height)
        self.stride, self.format = stride, fmt

    def width(self) -> int:
        return self._w

    def height(self) -> int:
        return self._h


class QPixmap:
    def __init__(self, path: Optional[str] = None, _size: Tuple[int, int] = (0, 0)):
        self.path = path
        if path is not None:
            from PIL import Image

            with Image.open(path) as im:
                _size = im.size  # (w, h)
        self._w, self._h = int(_size[0]), int(_size[1])

    @staticmethod
    def fromImage(image: QImage) -> "QPixmap":
        return QPixmap(_size=(image.width(), image.height()))

    def scaled(self, w: int, h: int) -> "QPixmap":
        return QPixmap(self.path, _size=(w, h))

    def scaledToWidth(self, w: int) -> "QPixmap":
        h = int(self._h * w / self._w) if self._w else 0
        return QPixmap(self.path, _size=(w, h))

    def size(self) -> QSize:
        return QSize(self._w, self._h)


class QPainter:
    def __init__(self, widget) -> None:
        self.widget = widget
        self.calls: List[Tuple[str, tuple]] = []

    def setBrush(self, brush) -> None:
        self.calls.append(("setBrush", (brush,)))

    def drawRect(self, x, y, w, h) -> None:
        self.calls.append(("drawRect", (x, y, w, h)))


class QWidget:
    def __init__(self, parent: Optional["QWidget"] = None) -> None:
        self._parent = parent
        self._visible = False
        self._closed = False
        self._deleted = False
        self._size = (640, 480)

    # Geometry / lifecycle -------------------------------------------- #
    def setFixedSize(self, w: int, h: int) -> None:
        self._size = (w, h)

    def resize(self, w: int, h: int) -> None:
        self._size = (w, h)

    def width(self) -> int:
        return self._size[0]

    def height(self) -> int:
        return self._size[1]

    def size(self) -> QSize:
        return QSize(*self._size)

    def show(self) -> None:
        self._visible = True

    def hide(self) -> None:
        self._visible = False

    def isVisible(self) -> bool:
        return self._visible and not self._closed

    def close(self) -> None:
        self._closed = True
        self._visible = False

    def deleteLater(self) -> None:
        self._deleted = True

    def parent(self) -> Optional["QWidget"]:
        return self._parent

    def setParent(self, parent: Optional["QWidget"]) -> None:
        self._parent = parent

    # Cosmetic no-ops the GUI modules call ----------------------------- #
    def setStyleSheet(self, sheet: str) -> None:
        self._style = sheet

    def setFont(self, font: QFont) -> None:
        self._font = font

    def setWindowTitle(self, title: str) -> None:
        self._title = title

    def repaint(self) -> None:
        self._repainted = True

    def mousePressEvent(self, event) -> None:  # base handler (no-op)
        pass

    def paintEvent(self, event) -> None:  # base handler (no-op)
        pass


class QMainWindow(QWidget):
    def __init__(self, parent: Optional[QWidget] = None) -> None:
        super().__init__(parent)
        self._central: Optional[QWidget] = None

    def setCentralWidget(self, widget: QWidget) -> None:
        self._central = widget

    def centralWidget(self) -> Optional[QWidget]:
        return self._central


class QLabel(QWidget):
    def __init__(self, text_or_parent=None, parent: Optional[QWidget] = None):
        if isinstance(text_or_parent, str):
            text = text_or_parent
        else:
            text, parent = "", text_or_parent
        super().__init__(parent)
        self._text = text
        self._pixmap: Optional[QPixmap] = None

    def setText(self, text: str) -> None:
        self._text = text

    def text(self) -> str:
        return self._text

    def setPixmap(self, pixmap: QPixmap) -> None:
        self._pixmap = pixmap
        # A real QLabel resizes to its pixmap under the default size
        # policy; the click math divides by the label size, so track it.
        self._size = (pixmap.size().width(), pixmap.size().height())

    def pixmap(self) -> Optional[QPixmap]:
        return self._pixmap

    def setAlignment(self, flags) -> None:
        self._alignment = flags


class QPushButton(QWidget):
    clicked = pyqtSignal(bool)

    def __init__(self, text: str = "", parent: Optional[QWidget] = None) -> None:
        super().__init__(parent)
        self._text = text

    def text(self) -> str:
        return self._text

    def setMaximumWidth(self, w: int) -> None:
        self._max_width = w

    def click(self) -> None:
        self.clicked.emit(False)


class _Layout:
    def __init__(self, parent: Optional[QWidget] = None) -> None:
        self.parent = parent
        self.items: List[Any] = []

    def addWidget(self, widget, *grid_pos, alignment=None) -> None:
        self.items.append(widget)

    def removeWidget(self, widget) -> None:
        if widget in self.items:
            self.items.remove(widget)

    def addLayout(self, layout: "_Layout") -> None:
        self.items.append(layout)


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QGridLayout(_Layout):
    pass


class QApplication:
    def __init__(self, argv) -> None:
        self.argv = argv

    def exec_(self) -> int:
        return 0


class QtEvent:
    """Mouse event with the .x()/.y() accessors FloorPlanImageArea reads."""

    def __init__(self, x: int, y: int) -> None:
        self._x, self._y = x, y

    def x(self) -> int:
        return self._x

    def y(self) -> int:
        return self._y


def install_fake_pyqt5() -> Dict[str, Optional[types.ModuleType]]:
    """Install fake PyQt5 modules into sys.modules; returns the previous
    entries so callers can restore them (see tests/test_gui_exec.py)."""
    pyqt5 = types.ModuleType("PyQt5")
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.Qt = _QtNamespace
    qtcore.pyqtSignal = pyqtSignal
    qtgui = types.ModuleType("PyQt5.QtGui")
    for cls in (QColor, QFont, QImage, QPainter, QPixmap):
        setattr(qtgui, cls.__name__, cls)
    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    for cls in (
        QApplication,
        QGridLayout,
        QHBoxLayout,
        QLabel,
        QMainWindow,
        QPushButton,
        QVBoxLayout,
        QWidget,
    ):
        setattr(qtwidgets, cls.__name__, cls)
    pyqt5.QtCore, pyqt5.QtGui, pyqt5.QtWidgets = qtcore, qtgui, qtwidgets

    previous = {
        name: sys.modules.get(name)
        for name in ("PyQt5", "PyQt5.QtCore", "PyQt5.QtGui", "PyQt5.QtWidgets")
    }
    sys.modules["PyQt5"] = pyqt5
    sys.modules["PyQt5.QtCore"] = qtcore
    sys.modules["PyQt5.QtGui"] = qtgui
    sys.modules["PyQt5.QtWidgets"] = qtwidgets
    return previous


def restore_modules(previous: Dict[str, Optional[types.ModuleType]]) -> None:
    for name, mod in previous.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod


# --------------------------------------------------------------------- #
# Fake tkinter
# --------------------------------------------------------------------- #


class TkWidget:
    """Shared fake for tk.Frame / tk.Label / tk.Button."""

    def __init__(self, parent=None, **kwargs) -> None:
        self.parent = parent
        self.kwargs = dict(kwargs)
        self.children: List["TkWidget"] = []
        self.bindings: Dict[str, Callable] = {}
        self.packed = False
        self.destroyed = False
        if parent is not None and hasattr(parent, "children"):
            parent.children.append(self)

    # Layout ----------------------------------------------------------- #
    def pack(self, **kwargs) -> None:
        self.packed = True

    def pack_forget(self) -> None:
        self.packed = False

    def grid(self, **kwargs) -> None:
        self.packed = True
        self.grid_kwargs = kwargs

    def destroy(self) -> None:
        self.destroyed = True
        for child in self.children:
            child.destroy()

    # Behavior ---------------------------------------------------------- #
    def bind(self, event: str, handler: Callable) -> None:
        self.bindings[event] = handler

    def configure(self, **kwargs) -> None:
        self.kwargs.update(kwargs)

    def invoke(self) -> None:
        """Press a Button (tkinter's own Button.invoke())."""
        command = self.kwargs.get("command")
        if command is not None:
            command()

    # Geometry: labels report their image's size (a mapped tk.Label sizes
    # to its image; the floor-plan click math divides by these).
    def winfo_width(self) -> int:
        image = self.kwargs.get("image")
        return getattr(image, "width", 1)

    def winfo_height(self) -> int:
        image = self.kwargs.get("image")
        return getattr(image, "height", 1)

    def find(self, predicate) -> List["TkWidget"]:
        """Depth-first search helper for tests (not a tkinter API)."""
        found = [w for w in self.children if predicate(w)]
        for child in self.children:
            found.extend(child.find(predicate))
        return found


class TkRoot(TkWidget):
    def __init__(self) -> None:
        super().__init__(None)
        self.after_calls: List[Callable] = []

    def title(self, text: str) -> None:
        self._title = text

    def geometry(self, spec: str) -> None:
        self._geometry = spec

    def after(self, _ms: int, callback: Callable) -> None:
        # Synchronous: gui_tk's worker thread posts frame installs through
        # after(); running them inline keeps the test deterministic.
        self.after_calls.append(callback)
        callback()

    def mainloop(self) -> None:
        pass


class TkPhotoImage:
    """Stands in for PIL.ImageTk.PhotoImage (which needs a live Tk)."""

    def __init__(self, image) -> None:
        self.image = image
        self.width, self.height = image.size


class TkEvent:
    def __init__(self, x: int, y: int) -> None:
        self.x, self.y = x, y


def make_fake_tk() -> types.SimpleNamespace:
    """Namespace with the tk attributes gui_tk.py touches."""
    return types.SimpleNamespace(
        Tk=TkRoot,
        Frame=TkWidget,
        Label=TkWidget,
        Button=TkWidget,
        FLAT="flat",
        BOTH="both",
        LEFT="left",
    )
