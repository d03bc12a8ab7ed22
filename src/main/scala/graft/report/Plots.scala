package graft.report

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage

/** N4 plot rendering (reference `src/pipeline_import/plots.py`),
  * re-expressed on `java.awt`/`javax.imageio` — zero external deps, fully
  * deterministic PNG bytes for a given input.
  *
  * Faithful content, not pixel-identical style: the stacked
  * win/draw/loss bars in green/yellow/red with in-bar percentage labels
  * (`plots.py:10-50`), and the elo-by-weekday chart with a blue mean line,
  * std error bars, dashed grey min/max lines, Sunday-first weekday ticks,
  * and the "No games played" empty state (`plots.py:53-127`).
  */
object Plots {

  locally { javax.imageio.ImageIO.setUseCache(false) }

  private val W = 640
  private val H = 480
  private val Margin = 60

  private def canvas(): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, W, H)
    // whitegrid style: light horizontal gridlines
    g.setColor(new Color(0xe6, 0xe6, 0xe6))
    (0 to 10).foreach { i =>
      val y = Margin + i * (H - 2 * Margin) / 10
      g.drawLine(Margin, y, W - Margin, y)
    }
    (img, g)
  }

  private def write(img: BufferedImage, file: java.io.File): Unit = {
    file.getParentFile.mkdirs()
    javax.imageio.ImageIO.write(img, "png", file)
  }

  /** One bar group per (category, color): stacked Win/Draw/Loss shares. */
  final case class ColorStatsRow(
      category: String, color: String, win: Double, draw: Double, loss: Double)

  def colorStatsPlot(rows: Seq[ColorStatsRow], file: java.io.File): Unit = {
    val (img, g) = canvas()
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 14))
    g.drawString("Win-loss ratio by color played", Margin, 30)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    g.drawString("Category / Color", W / 2 - 40, H - 12)
    g.drawString("Ratio", 8, H / 2)

    val plotH = H - 2 * Margin
    val n = math.max(rows.length, 1)
    val slot = (W - 2 * Margin) / n
    val barW = math.max(slot * 6 / 10, 8)
    val colors = Seq(new Color(0x2c, 0xa0, 0x2c), new Color(0xff, 0xd7, 0x00),
      new Color(0xd6, 0x27, 0x28)) // green / yellow / red
    rows.zipWithIndex.foreach { case (r, i) =>
      val x = Margin + i * slot + (slot - barW) / 2
      var yTop = Margin + plotH // stack from the bottom: win, draw, loss
      Seq(r.win, r.draw, r.loss).zip(colors).foreach { case (share, c) =>
        val h = (share * plotH).round.toInt
        yTop -= h
        g.setColor(c)
        g.fillRect(x, yTop, barW, h)
        if (h > 12) { // in-bar percentage label (plots.py:38-45)
          g.setColor(Color.BLACK)
          g.drawString(f"${share * 100}%.2f%%", x + 2, yTop + h / 2 + 4)
        }
      }
      g.setColor(Color.BLACK)
      g.drawString(s"${r.category}/${r.color}", x, H - Margin + 16)
    }
    g.dispose()
    write(img, file)
  }

  /** Sunday-first weekday stats: mean with std error bars, min/max dashed. */
  final case class EloRow(weekday: Int, mean: Double, std: Double, min: Double, max: Double)

  def eloByWeekdayPlot(rows: Seq[EloRow], file: java.io.File): Unit = {
    val (img, g) = canvas()
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 14))
    g.drawString("Elo evolution by day of week", Margin, 30)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    val weekdays = Seq("Sunday", "Monday", "Tuesday", "Wednesday",
      "Thursday", "Friday", "Saturday")
    val plotW = W - 2 * Margin
    val plotH = H - 2 * Margin
    def xAt(day: Double): Int = Margin + (day / 6.0 * plotW).round.toInt
    weekdays.zipWithIndex.foreach { case (w, i) =>
      g.setColor(Color.BLACK)
      g.drawString(w, xAt(i.toDouble) - 20, H - Margin + 16)
    }
    g.drawString("Weekday", W / 2 - 25, H - 12)
    g.drawString("Rating", 8, H / 2)

    if (rows.isEmpty) {
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 18))
      g.drawString("No games played", W / 2 - 80, H / 2)
      g.dispose(); write(img, file); return
    }

    val lo = rows.map(r => math.min(r.min, r.mean - r.std)).min - 10
    val hi = rows.map(r => math.max(r.max, r.mean + r.std)).max + 10
    def yAt(v: Double): Int =
      Margin + plotH - (((v - lo) / math.max(hi - lo, 1e-9)) * plotH).round.toInt

    val sorted = rows.sortBy(_.weekday)
    def polyline(vals: Seq[(Int, Double)], c: Color, dashed: Boolean): Unit = {
      g.setColor(c)
      g.setStroke(if (dashed)
        new BasicStroke(1.5f, BasicStroke.CAP_BUTT, BasicStroke.JOIN_MITER,
          10f, Array(6f, 6f), 0f)
      else new BasicStroke(2f))
      vals.sliding(2).foreach {
        case Seq((d1, v1), (d2, v2)) =>
          g.drawLine(xAt(d1.toDouble), yAt(v1), xAt(d2.toDouble), yAt(v2))
        case _ => ()
      }
    }
    val grey = new Color(0x99, 0x99, 0x99)
    polyline(sorted.map(r => r.weekday -> r.min), grey, dashed = true)
    polyline(sorted.map(r => r.weekday -> r.max), grey, dashed = true)
    polyline(sorted.map(r => r.weekday -> r.mean), Color.BLUE, dashed = false)
    // std error bars with caps (plots.py:60-68)
    g.setStroke(new BasicStroke(1f))
    g.setColor(Color.BLUE)
    sorted.foreach { r =>
      val x = xAt(r.weekday.toDouble)
      g.drawLine(x, yAt(r.mean - r.std), x, yAt(r.mean + r.std))
      g.drawLine(x - 4, yAt(r.mean - r.std), x + 4, yAt(r.mean - r.std))
      g.drawLine(x - 4, yAt(r.mean + r.std), x + 4, yAt(r.mean + r.std))
    }
    // annotate at the last day (plots.py:86-99)
    val last = sorted.last
    g.setColor(new Color(0x55, 0x55, 0x55))
    g.drawString("min", xAt(last.weekday.toDouble) + 4, yAt(last.min))
    g.drawString("max", xAt(last.weekday.toDouble) + 4, yAt(last.max))
    g.setColor(Color.BLACK)
    g.drawString("mean + std", xAt(last.weekday.toDouble) + 4, yAt(last.mean))
    g.dispose()
    write(img, file)
  }
}
