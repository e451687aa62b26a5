"""Observability web surface (app_backend data plane).

Parity: reference ``app_backend`` package — see ``web/app_backend.py``.
"""
