package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy gate for the `Detect` classifier (the documented whichlang
  * divergence): on a hand-labelled sample of ≥20-word natural-prose
  * passages, the detector must reach ≥ 0.9 accuracy for Latin-script
  * languages and 1.0 for the script-routed ones. (The driver testdata's
  * `lang` column is synthetic — every row shares one English vocabulary —
  * so the labelled corpus lives here.)
  */
class DetectAccuracySpec extends AnyFunSuite {

  private val latin: Seq[(Language, String)] = Seq(
    Language.English -> ("the weather was not what we had hoped for but we " +
      "decided that it would be better to start early because the road to " +
      "the coast is long and there are many things we wanted to see"),
    Language.English -> ("she said that they would have been here by now if " +
      "the train had not been delayed and that we should not wait for them " +
      "any longer than an hour or so before we leave"),
    Language.German -> ("das wetter war nicht das was wir uns erhofft hatten " +
      "aber wir haben uns entschieden dass es besser wäre früh aufzubrechen " +
      "weil der weg zur küste lang ist und wir noch vieles sehen wollten"),
    Language.German -> ("er sagte dass sie schon hier gewesen wären wenn der " +
      "zug keine verspätung gehabt hätte und dass wir nicht länger als eine " +
      "stunde auf sie warten sollten bevor wir gehen"),
    Language.French -> ("le temps n'était pas ce que nous avions espéré mais " +
      "nous avons décidé qu'il valait mieux partir tôt parce que la route " +
      "vers la côte est longue et nous voulions voir beaucoup de choses"),
    Language.French -> ("elle a dit qu'ils seraient déjà ici si le train " +
      "n'avait pas été retardé et que nous ne devrions pas les attendre " +
      "plus d'une heure avant de partir"),
    Language.Spanish -> ("el tiempo no era lo que habíamos esperado pero " +
      "decidimos que sería mejor salir temprano porque el camino hacia la " +
      "costa es largo y queríamos ver muchas cosas durante el viaje"),
    Language.Spanish -> ("ella dijo que ellos ya habrían llegado si el tren " +
      "no se hubiera retrasado y que no deberíamos esperarlos más de una " +
      "hora antes de irnos hacia el pueblo"),
    Language.Italian -> ("il tempo non era quello che avevamo sperato ma " +
      "abbiamo deciso che sarebbe stato meglio partire presto perché la " +
      "strada verso la costa è lunga e volevamo vedere molte cose"),
    Language.Italian -> ("lei ha detto che loro sarebbero già arrivati se il " +
      "treno non fosse stato in ritardo e che non dovremmo aspettarli più " +
      "di un'ora prima di partire per il paese"),
    Language.Portuguese -> ("o tempo não era o que tínhamos esperado mas " +
      "decidimos que seria melhor sair cedo porque o caminho para a costa " +
      "é longo e queríamos ver muitas coisas durante a viagem"),
    Language.Portuguese -> ("ela disse que eles já teriam chegado se o " +
      "comboio não tivesse atrasado e que não deveríamos esperar por eles " +
      "mais do que uma hora antes de partirmos"),
    Language.Dutch -> ("het weer was niet wat we hadden gehoopt maar we " +
      "besloten dat het beter zou zijn om vroeg te vertrekken omdat de weg " +
      "naar de kust lang is en we nog veel wilden zien"),
    Language.Dutch -> ("ze zei dat ze er al geweest zouden zijn als de trein " +
      "geen vertraging had gehad en dat we niet langer dan een uur op hen " +
      "moesten wachten voordat we vertrekken"),
    Language.Danish -> ("vejret var ikke hvad vi havde håbet på men vi " +
      "besluttede at det ville være bedre at tage tidligt afsted fordi " +
      "vejen til kysten er lang og vi ville gerne se mange ting"),
    Language.Danish -> ("hun sagde at de allerede ville have været her hvis " +
      "toget ikke var blevet forsinket og at vi ikke skulle vente på dem " +
      "mere end en time før vi tager afsted"),
    Language.Norwegian -> ("været var ikke slik vi hadde håpet men vi " +
      "bestemte oss for at det ville være bedre å dra tidlig fordi veien " +
      "til kysten er lang og vi ville gjerne se mange ting"),
    Language.Norwegian -> ("hun sa at de allerede ville ha vært her hvis " +
      "toget ikke hadde blitt forsinket og at vi ikke skulle vente på dem " +
      "mer enn en time før vi drar"),
    Language.Swedish -> ("vädret var inte vad vi hade hoppats på men vi " +
      "bestämde oss för att det vore bättre att åka tidigt eftersom vägen " +
      "till kusten är lång och vi ville gärna se många saker"),
    Language.Swedish -> ("hon sade att de redan skulle ha varit här om " +
      "tåget inte hade blivit försenat och att vi inte borde vänta på dem " +
      "mer än en timme innan vi åker"),
    Language.Romanian -> ("vremea nu era ceea ce am sperat dar am decis că " +
      "ar fi mai bine să plecăm devreme pentru că drumul spre coastă este " +
      "lung și voiam să vedem multe lucruri pe drum"),
    Language.Romanian -> ("ea a spus că ei ar fi ajuns deja dacă trenul nu " +
      "ar fi întârziat și că nu ar trebui să îi așteptăm mai mult de o oră " +
      "înainte să plecăm spre sat"),
    Language.Hungarian -> ("az idő nem olyan volt amilyenre számítottunk de " +
      "úgy döntöttünk hogy jobb lenne korán elindulni mert az út a partig " +
      "hosszú és még sok mindent szerettünk volna látni"),
    Language.Hungarian -> ("azt mondta hogy ők már itt lettek volna ha a " +
      "vonat nem késett volna és hogy nem kellene rájuk várnunk egy óránál " +
      "tovább mielőtt elindulunk a faluba"),
    Language.Turkish -> ("hava umduğumuz gibi değildi ama yola erken çıkmanın " +
      "daha iyi olacağına karar verdik çünkü sahile giden yol uzun ve daha " +
      "görmek istediğimiz çok şey vardı bu yüzden erkenden hazırlandık"),
    Language.Turkish -> ("o dedi ki tren gecikmeseydi onlar çoktan burada " +
      "olurlardı ve biz de gitmeden önce onları bir saatten fazla " +
      "beklememeliydik çünkü akşam olmadan köye varmak istiyorduk"))

  test("Latin-script detection accuracy ≥ 0.9 on ≥20-word labelled prose") {
    val results = latin.map { case (want, text) =>
      assert(text.split(' ').length >= 20, s"sample too short for ${want.name}")
      val got = LanguageDetector.detect(text)
      (want, got, got.contains(want))
    }
    val acc = results.count(_._3).toDouble / results.size
    val misses = results.filterNot(_._3)
      .map { case (w, g, _) => s"${w.name}→${g.map(_.name).getOrElse("none")}" }
    assert(acc >= 0.9, s"accuracy $acc; misses: ${misses.mkString(", ")}")
  }

  test("script-routed languages detect with accuracy 1.0") {
    val samples = Seq(
      Language.Russian -> "мы решили выехать рано утром потому что дорога к морю длинная",
      Language.Greek -> "αποφασίσαμε να φύγουμε νωρίς γιατί ο δρόμος προς τη θάλασσα είναι μακρύς",
      Language.Arabic -> "قررنا أن نغادر مبكرا لأن الطريق إلى البحر طويل جدا",
      Language.Tamil -> "கடலுக்கு செல்லும் பாதை நீளமாக இருப்பதால் அதிகாலையில் புறப்பட முடிவு செய்தோம்")
    samples.foreach { case (want, text) =>
      assert(LanguageDetector.detect(text).contains(want), want.name)
    }
  }
}
