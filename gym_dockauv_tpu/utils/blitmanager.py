"""Matplotlib blitting helper (role of gym_dockauv/utils/blitmanager.py:4-78)."""
from __future__ import annotations


class BlitManager:
    def __init__(self, canvas, animated_artists=()):
        self.canvas = canvas
        self._bg = None
        self._artists = []
        for a in animated_artists:
            self.add_artist(a)
        self._cid = canvas.mpl_connect("draw_event", self.on_draw)

    def on_draw(self, event):
        if event is not None and event.canvas != self.canvas:
            raise RuntimeError
        self._bg = self.canvas.copy_from_bbox(self.canvas.figure.bbox)
        self._draw_animated()

    def add_artist(self, art):
        if art.figure != self.canvas.figure:
            raise RuntimeError
        art.set_animated(True)
        self._artists.append(art)

    def _draw_animated(self):
        for a in self._artists:
            self.canvas.figure.draw_artist(a)

    def update(self):
        if self._bg is None:
            self.on_draw(None)
        else:
            self.canvas.restore_region(self._bg)
            self._draw_animated()
            self.canvas.blit(self.canvas.figure.bbox)
        self.canvas.flush_events()
