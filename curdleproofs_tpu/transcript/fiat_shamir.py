"""Curdleproofs Fiat–Shamir transcript: Merlin + rejection-sampled Fr challenges.

Bit-exactness of the entire proof system hinges on this loop matching the
reference exactly (curdleproofs/curdleproofs_transcript.py:15-28): draw 32
little-endian bytes, retry while the integer is >= r or the scalar is zero,
and append the *accepted* bytes back into the transcript.
"""
from __future__ import annotations

from typing import List

from curdleproofs_tpu.fields import FR_MOD, Fr
from curdleproofs_tpu.transcript.merlin import MerlinTranscript


class CurdleproofsTranscript(MerlinTranscript):
    def append(self, label: bytes, item: bytes) -> None:
        self.append_message(label, item)

    def append_list(self, label: bytes, items) -> None:
        for item in items:
            self.append_message(label, item)

    def get_and_append_challenge(self, label: bytes) -> Fr:
        while True:
            challenge_bytes = self.challenge_bytes(label, 32)
            value = int.from_bytes(challenge_bytes, "little")
            if value >= FR_MOD or value == 0:
                continue
            self.append(label, challenge_bytes)
            return Fr(value)

    def get_and_append_challenges(self, label: bytes, n: int) -> List[Fr]:
        return [self.get_and_append_challenge(label) for _ in range(n)]
