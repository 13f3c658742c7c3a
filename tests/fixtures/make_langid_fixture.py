"""Generate langid_sentences.parquet — hand-written sentences in the
five corpus languages (en/es/de/fr/zh) with ground-truth labels.

Why a fixture at all: the synthetic ``documents`` table draws its text
from one shared 31-word English vocabulary for EVERY ``lang`` label
(verified: per-lang top-word distributions are identical draws), so a
holdout-accuracy gate against ``documents.lang`` would measure noise.
Real language identification needs real text; these sentences are
ordinary hand-written prose in each language (lowercase, plain code
points, no combining marks) — the same posture as the HTML fixture's
hand-written expectations.

Columns: sent_id BIGINT, lang VARCHAR, text VARCHAR, is_train BOOLEAN.
Per language: 8 training sentences, 4 holdout sentences.

Run once: python tests/fixtures/make_langid_fixture.py
"""

import pyarrow as pa
import pyarrow.parquet as pq

SENTENCES = {
    "en": [
        "the weather turned cold last night and the streets were quiet",
        "she finished reading the book before the train reached the city",
        "every morning he walks along the river with his old dog",
        "the committee agreed to postpone the vote until next week",
        "children were playing football in the park after school",
        "the recipe calls for two cups of flour and a pinch of salt",
        "we watched the storm roll in from the balcony of the hotel",
        "his answer surprised everyone who attended the meeting",
        "the library closes early on friday during the summer months",
        "a narrow path leads through the forest to the lighthouse",
        "they repaired the bridge after the flood damaged its base",
        "the orchestra rehearsed the symphony twice before the concert",
    ],
    "es": [
        "el clima se puso frio anoche y las calles estaban tranquilas",
        "ella termino de leer el libro antes de llegar a la ciudad",
        "cada manana el camina junto al rio con su perro viejo",
        "el comite acordo aplazar la votacion hasta la proxima semana",
        "los ninos jugaban al futbol en el parque despues de la escuela",
        "la receta lleva dos tazas de harina y una pizca de sal",
        "vimos llegar la tormenta desde el balcon del hotel",
        "su respuesta sorprendio a todos los que asistieron a la reunion",
        "la biblioteca cierra temprano los viernes durante el verano",
        "un sendero estrecho atraviesa el bosque hasta el faro",
        "repararon el puente despues de que la inundacion dano su base",
        "la orquesta ensayo la sinfonia dos veces antes del concierto",
    ],
    "de": [
        "das wetter wurde letzte nacht kalt und die strassen waren still",
        "sie las das buch zu ende bevor der zug die stadt erreichte",
        "jeden morgen geht er mit seinem alten hund am fluss entlang",
        "der ausschuss beschloss die abstimmung auf naechste woche zu verschieben",
        "kinder spielten nach der schule fussball im park",
        "das rezept verlangt zwei tassen mehl und eine prise salz",
        "wir sahen den sturm vom balkon des hotels heranziehen",
        "seine antwort ueberraschte alle die an der sitzung teilnahmen",
        "die bibliothek schliesst freitags im sommer frueher",
        "ein schmaler pfad fuehrt durch den wald zum leuchtturm",
        "sie reparierten die bruecke nachdem das hochwasser den sockel beschaedigt hatte",
        "das orchester probte die sinfonie zweimal vor dem konzert",
    ],
    "fr": [
        "le temps est devenu froid cette nuit et les rues etaient calmes",
        "elle a fini de lire le livre avant que le train arrive en ville",
        "chaque matin il marche le long de la riviere avec son vieux chien",
        "le comite a decide de reporter le vote a la semaine prochaine",
        "les enfants jouaient au football dans le parc apres la classe",
        "la recette demande deux tasses de farine et une pincee de sel",
        "nous avons regarde arriver la tempete depuis le balcon",
        "sa reponse a surpris tous ceux qui assistaient a la reunion",
        "la bibliotheque ferme plus tot le vendredi pendant les vacances",
        "un sentier etroit traverse la foret jusqu au phare",
        "ils ont repare le pont apres que la crue a endommage sa base",
        "l orchestre a repete la symphonie deux fois avant le concert",
    ],
    "zh": [
        "昨天夜里天气变冷了街道上很安静",
        "她在火车到达城市之前读完了那本书",
        "每天早晨他带着老狗沿着河边散步",
        "委员会同意把投票推迟到下个星期",
        "孩子们放学后在公园里踢足球",
        "这个食谱需要两杯面粉和一点盐",
        "我们在旅馆的阳台上看着暴风雨到来",
        "他的回答让参加会议的每个人都感到惊讶",
        "图书馆在夏天的星期五会提前关门",
        "一条狭窄的小路穿过森林通向灯塔",
        "洪水损坏桥基之后他们修好了那座桥",
        "乐团在音乐会之前把交响曲排练了两遍",
    ],
}

N_TRAIN = 8


def main() -> None:
    sent_id, lang, text, is_train = [], [], [], []
    i = 0
    for lg in sorted(SENTENCES):
        for j, s in enumerate(SENTENCES[lg]):
            sent_id.append(i)
            lang.append(lg)
            text.append(s)
            is_train.append(j < N_TRAIN)
            i += 1
    table = pa.table(
        {
            "sent_id": pa.array(sent_id, pa.int64()),
            "lang": pa.array(lang, pa.string()),
            "text": pa.array(text, pa.string()),
            "is_train": pa.array(is_train, pa.bool_()),
        }
    )
    import pathlib

    out = pathlib.Path(__file__).parent / "langid_sentences.parquet"
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
