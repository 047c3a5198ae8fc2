"""Reusable operator library.

- ``dedup``   : keyed-state dedup/flag patterns D1-D4 (batch forms)
- ``windows`` : event-time tumbling-window helpers (W2)
- ``text_dedup`` / ``simsearch`` / ``text_analysis`` / ``multimodal`` :
  training-data-pipeline operators beyond the reference surface
"""
