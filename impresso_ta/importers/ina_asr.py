"""INA-style ASR (radio broadcast) importer plugin.

Re-implements the reference's INA import semantics
(ref: importers/ina/classes.py:29-262, ina/helpers.py:7-89):

- one issue = one broadcast directory holding a single ASR XML
  (``SpeechSegment``/``Word`` elements with stime/etime/dur/spkid/lang)
  and a ``metadata.json`` sidecar (program, channel, optional duration —
  the sidecar replaces the reference's mutagen-mp3 probe, SURVEY X15),
- utterances group consecutive speech segments of the same speaker
  (stateful scan, ref: ina/helpers.py:30-89),
- language = majority vote over segment/speaker ``lang`` attributes with
  ISO-639-2→639-1 normalization (SURVEY A6/X12; deterministic tie-break
  by code),
- one content item per issue (``radio_broadcast_episode``), one audio
  record; the single section spans first-utterance start → max etime and
  carries ``pOf`` = the CI id.
"""

from __future__ import annotations

import json
import os
import time
import xml.etree.ElementTree as ET
from collections import Counter
from typing import Any

from impresso_ta.importers.base import FormatPlugin, register

IIIF_ENDPOINT_URI = "https://impresso-project.ch/media/audio/"

# ISO-639-2 → 639-1 (ref: ina/classes.py:26, extended)
LANG_MAPPING = {"fre": "fr", "ger": "de", "eng": "en", "ita": "it"}


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _segments(root: ET.Element) -> list[ET.Element]:
    return [el for el in root.iter() if _strip_ns(el.tag) == "SpeechSegment"]


def get_utterances(root: ET.Element) -> list[dict]:
    """Group consecutive same-speaker speech segments into utterances
    (ref: ina/helpers.py:30-89)."""
    utterances: list[dict] = []
    current_ss: list[dict] = []
    last_speaker = None
    utt_stime = 0.0
    utt_etime = 0.0

    segs = _segments(root)
    for idx, ss in enumerate(segs):
        stime = float(ss.get("stime"))
        etime = float(ss.get("etime"))
        tokens = [
            {
                "tc": [float(w.get("stime")), float(w.get("dur"))],
                "tx": (w.text or "").strip(),
            }
            for w in ss
            if _strip_ns(w.tag) == "Word"
        ]
        entry = {"tc": [stime, etime - stime], "t": tokens}

        if ss.get("spkid") == last_speaker:
            current_ss.append(entry)
            utt_etime = etime
        else:
            if last_speaker is not None:
                utterances.append(
                    {
                        "tc": [utt_stime, utt_etime - utt_stime],
                        "ss": current_ss,
                    }
                )
            utt_stime, utt_etime = stime, etime
            last_speaker = ss.get("spkid")
            current_ss = [entry]

        if idx == len(segs) - 1:
            utterances.append(
                {"tc": [utt_stime, utt_etime - utt_stime], "ss": current_ss}
            )
    return utterances


def majority_language(root: ET.Element) -> str | None:
    """Most frequent lang attribute over Speaker + SpeechSegment elements,
    normalized; ties broken by code (deterministic — the reference's
    ``max(Counter)`` was dict-order dependent)."""
    langs = [
        el.get("lang")
        for el in root.iter()
        if _strip_ns(el.tag) in ("Speaker", "SpeechSegment") and el.get("lang")
    ]
    if not langs:
        return None
    counts = Counter(langs)
    best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    return LANG_MAPPING.get(best, best)


class InaAsrPlugin(FormatPlugin):
    name = "ina_asr"

    @staticmethod
    def _map_ina_manifest(m: dict[str, Any]) -> dict[str, Any]:
        """Map the reference manifest's French archive fields onto the
        sidecar vocabulary (ref: ina/classes.py:262-289
        ``_fetch_broadcast_metadata`` / ``_parse_content_item``)."""
        channel = m.get("Canal de diffusion")
        if channel and m.get("Société de programmes"):
            channel = f"{channel} ({m['Société de programmes']})"
        resume = m.get("Résumé")
        return {
            "title": m.get("Titre propre"),
            "program": m.get("Titre collection"),
            "channel": channel,
            "duration": m.get("Durée"),
            "archival_note": resume,
            # ref: ina/classes.py:230-233 — language short-circuit
            "lang_override": "en" if resume and "En anglais" in resume else None,
            "notice_id": m.get("Identifiant de la notice"),
            "noms_fichers": m.get("Noms fichers"),
        }

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        record_id = f"{issue_id}-r0001"
        ci_id = f"{issue_id}-i0001"

        xml_files = sorted(
            f for f in os.listdir(path) if f.lower().endswith(".xml")
        )
        if len(xml_files) != 1:
            raise ValueError(
                f"{issue_id} - expected exactly one ASR XML in {path}, "
                f"found {len(xml_files)}"
            )
        with open(os.path.join(path, xml_files[0]), "rb") as f:
            root = ET.fromstring(f.read())

        meta: dict[str, Any] = {}
        meta_path = os.path.join(path, "metadata.json")
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as f:
                meta = json.load(f)
        else:
            # reference layout (ref: ina/classes.py:181-289): a single
            # ``ina_metadata.json`` manifest in the PARENT dir, keyed by
            # this broadcast directory's basename, with French archive
            # field names — mapped here onto the sidecar vocabulary.
            manifest_path = os.path.join(
                os.path.dirname(path.rstrip(os.sep)), "ina_metadata.json"
            )
            key = os.path.basename(path.rstrip(os.sep))
            if os.path.exists(manifest_path):
                with open(manifest_path, encoding="utf-8") as f:
                    manifest = json.load(f)
                meta = self._map_ina_manifest(manifest.get(key, {}))

        utterances = get_utterances(root)
        if not utterances:
            raise ValueError(f"{issue_id} - ASR XML contains no speech segments")
        section_stime = utterances[0]["tc"][0]
        section_etime = max(float(ss.get("etime")) for ss in _segments(root))

        # duration: sidecar metadata (either a ready HH:MM:SS string from
        # the INA manifest's "Durée", or duration_sec), else derived from
        # the last etime (the reference probes the mp3 with mutagen — X15;
        # a sidecar media-metadata table is the engine-pure equivalent)
        if meta.get("duration"):
            dur = str(meta["duration"]).strip()
        else:
            dur_sec = float(meta.get("duration_sec", section_etime))
            dur = time.strftime("%H:%M:%S", time.gmtime(dur_sec))

        internal = os.path.dirname(record_id.replace("-", "/"))
        iiif = os.path.join(IIIF_ENDPOINT_URI, "INA", internal, f"{record_id}.mp3")

        record = {
            "id": record_id,
            "st": "radio_broadcast",
            "sm": "audio",
            "cc": True,
            "iiif_base_uri": iiif,
            "stt": "00:00:00",
            "dur": dur,
            "s": [
                {
                    "tc": [section_stime, section_etime - section_stime],
                    "u": utterances,
                    "pOf": ci_id,
                }
            ],
        }

        legacy = None
        if meta.get("notice_id") or meta.get("noms_fichers"):
            # ref: ina/classes.py:269-276 — the original notice id and
            # filename(s), both as recorded and as found on disk
            legacy = {
                "source": "; ".join(
                    [
                        "Identifiant de la notice (in metadata): "
                        f"{meta.get('notice_id')}",
                        f"Noms fichers (in metadata): {meta.get('noms_fichers')}",
                        "Noms fichers (in practice): "
                        f"{os.path.splitext(xml_files[0])[0]}",
                    ]
                )
            }

        ci = {
            "m": {
                "id": ci_id,
                "rr": [1],
                "tp": "radio_broadcast_episode",
                # ref: ina/classes.py:230-233 — a "En anglais" archive
                # summary overrides the ASR language vote
                "lg": meta.get("lang_override") or majority_language(root),
                "ro": 1,
                "t": meta.get("title"),
                "archival_note": meta.get("archival_note"),
            },
            "l": legacy,
        }

        return {
            "id": issue_id,
            "st": "radio_broadcast",
            "sm": "audio",
            "i": [ci],
            "rr": [record_id],
            "rp": meta.get("program"),
            "rc": meta.get("channel"),
            "_pages": [record],
        }


register(InaAsrPlugin())
