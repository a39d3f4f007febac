"""Snowball stop-word lists for de/fr/es/it/pt (public, BSD-licensed;
from svn.tartarus.org/snowball stop.txt files).  The same sets the
reference loads in analysis/lang/{de,fr,es,it,pt}/stop_words_*.go."""

DE_STOP_WORDS = frozenset(
    """
aber alle allem allen aller alles als also
am an ander andere anderem anderen anderer anderes
anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann das dasselbe
dazu daß dein deine deinem deinen deiner deines
dem demselben den denn denselben der derer derselbe
derselben des desselben dessen dich die dies diese
dieselbe dieselben diesem diesen dieser dieses dir doch
dort du durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal
er es etwas euch euer eure eurem euren
eurer eures für gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich ihm
ihn ihnen ihr ihre ihrem ihren ihrer ihres
im in indem ins ist jede jedem jeden
jeder jedes jene jenem jenen jener jenes jetzt
kann kein keine keinem keinen keiner keines können
könnte machen man manche manchem manchen mancher manches
mein meine meinem meinen meiner meines mich mir
mit muss musste nach nicht nichts noch nun
nur ob oder ohne sehr sein seine seinem
seinen seiner seines selbst sich sie sind so
solche solchem solchen solcher solches soll sollte sondern
sonst um und uns unse unsem unsen unser
unses unter viel vom von vor war waren
warst was weg weil weiter welche welchem welchen
welcher welches wenn werde werden wie wieder will
wir wird wirst wo wollen wollte während würde
würden zu zum zur zwar zwischen über
""".split()
)

FR_STOP_WORDS = frozenset(
    """
ai aie aient aies ait as au aura
aurai auraient aurais aurait auras aurez auriez aurions
aurons auront aux avaient avais avait avec avez
aviez avions avons ayant ayez ayons c ce
ceci cela celà ces cet cette d dans
de des du elle en es est et
eu eue eues eurent eus eusse eussent eusses
eussiez eussions eut eux eûmes eût eûtes furent
fus fusse fussent fusses fussiez fussions fut fûmes
fût fûtes ici il ils j je l
la le les leur leurs lui m ma
mais me mes moi mon même n ne
nos notre nous on ont ou par pas
pour qu que quel quelle quelles quels qui
s sa sans se sera serai seraient serais
serait seras serez seriez serions serons seront ses
soi soient sois soit sommes son sont soyez
soyons suis sur t ta te tes toi
ton tu un une vos votre vous y
à étaient étais était étant étiez étions été
étée étées étés êtes
""".split()
)

ES_STOP_WORDS = frozenset(
    """
a al algo algunas algunos ante antes como
con contra cual cuando de del desde donde
durante e el ella ellas ellos en entre
era erais eran eras eres es esa esas
ese eso esos esta estaba estabais estaban estabas
estad estada estadas estado estados estamos estando estar
estaremos estará estarán estarás estaré estaréis estaría estaríais
estaríamos estarían estarías estas este estemos esto estos
estoy estuve estuviera estuvierais estuvieran estuvieras estuvieron estuviese
estuvieseis estuviesen estuvieses estuvimos estuviste estuvisteis estuviéramos estuviésemos
estuvo está estábamos estáis están estás esté estéis
estén estés fue fuera fuerais fueran fueras fueron
fuese fueseis fuesen fueses fui fuimos fuiste fuisteis
fuéramos fuésemos ha habida habidas habido habidos habiendo
habremos habrá habrán habrás habré habréis habría habríais
habríamos habrían habrías habéis había habíais habíamos habían
habías han has hasta hay haya hayamos hayan
hayas hayáis he hemos hube hubiera hubierais hubieran
hubieras hubieron hubiese hubieseis hubiesen hubieses hubimos hubiste
hubisteis hubiéramos hubiésemos hubo la las le les
lo los me mi mis mucho muchos muy
más mí mía mías mío míos nada ni
no nos nosotras nosotros nuestra nuestras nuestro nuestros
o os otra otras otro otros para pero
poco por porque que quien quienes qué se
sea seamos sean seas seremos será serán serás
seré seréis sería seríais seríamos serían serías seáis
sido siendo sin sobre sois somos son soy
su sus suya suyas suyo suyos sí también
tanto te tendremos tendrá tendrán tendrás tendré tendréis
tendría tendríais tendríamos tendrían tendrías tened tenemos tenga
tengamos tengan tengas tengo tengáis tenida tenidas tenido
tenidos teniendo tenéis tenía teníais teníamos tenían tenías
ti tiene tienen tienes todo todos tu tus
tuve tuviera tuvierais tuvieran tuvieras tuvieron tuviese tuvieseis
tuviesen tuvieses tuvimos tuviste tuvisteis tuviéramos tuviésemos tuvo
tuya tuyas tuyo tuyos tú un una uno
unos vosotras vosotros vuestra vuestras vuestro vuestros y
ya yo él éramos
""".split()
)

IT_STOP_WORDS = frozenset(
    """
a abbia abbiamo abbiano abbiate ad agl agli
ai al all alla alle allo anche avemmo
avendo avesse avessero avessi avessimo aveste avesti avete
aveva avevamo avevano avevate avevi avevo avrai avranno
avrebbe avrebbero avrei avremmo avremo avreste avresti avrete
avrà avrò avuta avute avuti avuto c che
chi ci coi col come con contro cui
da dagl dagli dai dal dall dalla dalle
dallo degl degli dei del dell della delle
dello di dov dove e ebbe ebbero ebbi
ed era erano eravamo eravate eri ero essendo
faccia facciamo facciano facciate faccio facemmo facendo facesse
facessero facessi facessimo faceste facesti faceva facevamo facevano
facevate facevi facevo fai fanno farai faranno farebbe
farebbero farei faremmo faremo fareste faresti farete farà
farò fece fecero feci fosse fossero fossi fossimo
foste fosti fu fui fummo furono gli ha
hai hanno ho i il in io l
la le lei li lo loro lui ma
mi mia mie miei mio ne negl negli
nei nel nell nella nelle nello noi non
nostra nostre nostri nostro o per perché più
quale quanta quante quanti quanto quella quelle quelli
quello questa queste questi questo sarai saranno sarebbe
sarebbero sarei saremmo saremo sareste saresti sarete sarà
sarò se sei si sia siamo siano siate
siete sono sta stai stando stanno starai staranno
starebbe starebbero starei staremmo staremo stareste staresti starete
starà starò stava stavamo stavano stavate stavi stavo
stemmo stesse stessero stessi stessimo steste stesti stette
stettero stetti stia stiamo stiano stiate sto su
sua sue sugl sugli sui sul sull sulla
sulle sullo suo suoi ti tra tu tua
tue tuo tuoi tutti tutto un una uno
vi voi vostra vostre vostri vostro è
""".split()
)

PT_STOP_WORDS = frozenset(
    """
a ao aos aquela aquelas aquele aqueles aquilo
as até com como da das de dela
delas dele deles depois do dos e ela
elas ele eles em entre era eram essa
essas esse esses esta estamos estas estava estavam
este esteja estejam estejamos estes esteve estive estivemos
estiver estivera estiveram estiverem estivermos estivesse estivessem estivéramos
estivéssemos estou está estávamos estão eu foi fomos
for fora foram forem formos fosse fossem fui
fôramos fôssemos haja hajam hajamos havemos hei houve
houvemos houver houvera houveram houverei houverem houveremos houveria
houveriam houvermos houverá houverão houveríamos houvesse houvessem houvéramos
houvéssemos há hão isso isto já lhe lhes
mais mas me mesmo meu meus minha minhas
muito na nas nem no nos nossa nossas
nosso nossos num numa não nós o os
ou para pela pelas pelo pelos por qual
quando que quem se seja sejam sejamos sem
serei seremos seria seriam será serão seríamos seu
seus somos sou sua suas são só também
te tem temos tenha tenham tenhamos tenho terei
teremos teria teriam terá terão teríamos teu teus
teve tinha tinham tive tivemos tiver tivera tiveram
tiverem tivermos tivesse tivessem tivéramos tivéssemos tu tua
tuas tém tínhamos um uma você vocês vos
à às éramos
""".split()
)



# Arabic stop words (Savoy BSD list, the same data the reference embeds in
# analysis/lang/ar/stop_words_ar.go)
AR_STOP_WORDS = frozenset(
    """
من ومن منها منه في وفي فيها فيه
و ف ثم او أو ب بها به
ا أ اى اي أي أى لا ولا
الا ألا إلا لكن ما وما كما فما
عن مع اذا إذا ان أن إن انها
أنها إنها انه أنه إنه بان بأن فان
فأن وان وأن وإن التى التي الذى الذي
الذين الى الي إلى إلي على عليها عليه
اما أما إما ايضا أيضا كل وكل لم
ولم لن ولن هى هي هو وهى وهي
وهو فهى فهي فهو انت أنت لك لها
له هذه هذا تلك ذلك هناك كانت كان
يكون تكون وكانت وكان غير بعض قد نحو
بين بينما منذ ضمن حيث الان الآن خلال
بعد قبل حتى عند عندما لدى جميع
""".split()
)

# Russian stop words (snowball stop.txt, reference stop_words_ru.go)
RU_STOP_WORDS = frozenset(
    """
и в во не что он на я
с со как а то все она так
его но да ты к у же вы
за бы по только ее мне было вот
от меня еще нет о из ему теперь
когда даже ну вдруг ли если уже или
ни быть был него до вас нибудь опять
уж вам сказал ведь там потом себя ничего
ей может они тут где есть надо ней
для мы тебя их чем была сам чтоб
без будто человек чего раз тоже себе под
жизнь будет ж тогда кто этот говорил того
потому этого какой совсем ним здесь этом один
почти мой тем чтобы нее кажется сейчас были
куда зачем сказать всех никогда сегодня можно при
наконец два об другой хоть после над больше
тот через эти нас про всего них какая
много разве сказала три эту моя впрочем хорошо
свою этой перед иногда лучше чуть том нельзя
такой им более всегда конечно всю между
""".split()
)


# Persian stop words (reference stop_words_fa.go; public BSD lists)
FA_STOP_WORDS = frozenset(
    """
انان نداشته سراسر خياه ايشان وي تاكنون بيشتري
دوم پس ناشي وگو يا داشتند سپس هنگام
هرگز پنج نشان امسال ديگر گروهي شدند چطور
ده و دو نخستين ولي چرا چه وسط
ه كدام قابل يك رفت هفت همچنين در
هزار بله بلي شايد اما شناسي گرفته دهد
داشته دانست داشتن خواهيم ميليارد وقتيكه امد خواهد
جز اورده شده بلكه خدمات شدن برخي نبود
بسياري جلوگيري حق كردند نوعي بعري نكرده نظير
نبايد بوده بودن داد اورد هست جايي شود
دنبال داده بايد سابق هيچ همان انجا كمتر
كجاست گردد كسي تر مردم تان دادن بودند
سري جدا ندارند مگر يكديگر دارد دهند بنابراين
هنگامي سمت جا انچه خود دادند زياد دارند
اثر بدون بهترين بيشتر البته به براساس بيرون
كرد بعضي گرفت توي اي ميليون او جريان
تول بر مانند برابر باشيم مدتي گويند اكنون
تا تنها جديد چند بي نشده كردن كردم
گويد كرده كنيم نمي نزد روي قصد فقط
بالاي ديگران اين ديروز توسط سوم ايم دانند
سوي استفاده شما كنار داريم ساخته طور امده
رفته نخست بيست نزديك طي كنيد از انها
تمامي داشت يكي طريق اش چيست روب نمايد
گفت چندين چيزي تواند ام ايا با ان
ايد ترين اينكه ديگري راه هايي بروز همچنان
پاعين كس حدود مختلف مقابل چيز گيرد ندارد
ضد همچون سازي شان مورد باره مرسي خويش
برخوردار چون خارج شش هنوز تحت ضمن هستيم
گفته فكر بسيار پيش براي روزهاي انكه نخواهد
بالا كل وقتي كي چنين كه گيري نيست
است كجا كند نيز يابد بندي حتي توانند
عقب خواست كنند بين تمام همه ما باشند
مثل شد اري باشد اره طبق بعد اگر
صورت غير جاي بيش ريزي اند زيرا چگونه
بار لطفا مي درباره من ديده همين گذاري
برداري علت گذاشته هم فوق نه ها شوند
اباد همواره هر اول خواهند چهار نام امروز
مان هاي قبل كنم سعي تازه را هستند
زير جلوي عنوان بود
""".split()
)


# Swedish (snowball) stop words (reference stop_words_sv.go; public BSD lists)
SV_STOP_WORDS = frozenset(
    """
och det att i en jag hon som
han på den med var sig för så
till är men ett om hade de av
icke mig du henne då sin nu har
inte hans honom skulle hennes där min man
ej vid kunde något från ut när efter
upp vi dem vara vad över än dig
kan sina här ha mot alla under någon
eller allt mycket sedan ju denna själv detta
åt utan varit hur ingen mitt ni bli
blev oss din dessa några deras blir mina
samma vilken er sådan vår blivit dess inom
mellan sådant varför varje vilka ditt vem vilket
sitta sådana vart dina vars vårt våra ert
era vilkas
""".split()
)


# Norwegian (snowball) stop words (reference stop_words_no.go; public BSD lists)
NO_STOP_WORDS = frozenset(
    """
og i jeg det at en et den
til er som på de med han av
ikke ikkje der så var meg seg men
ett har om vi min mitt ha hadde
hun nå over da ved fra du ut
sin dem oss opp man kan hans hvor
eller hva skal selv sjøl her alle vil
bli ble blei blitt kunne inn når være
kom noen noe ville dere som deres kun
ja etter ned skulle denne for deg si
sine sitt mot å meget hvorfor dette disse
uten hvordan ingen din ditt blir samme hvilken
hvilke sånn inni mellom vår hver hvem vors
hvis både bare enn fordi før mange også
slik vært være båe begge siden dykk dykkar
dei deira deires deim di då eg ein
eit eitt elles honom hjå ho hoe henne
hennar hennes hoss hossen ikkje ingi inkje korleis
korso kva kvar kvarhelst kven kvi kvifor me
medan mi mine mykje no nokon noka nokor
noko nokre si sia sidan so somt somme
um upp vere vore verte vort varte vart
""".split()
)


# Danish (snowball) stop words (reference stop_words_da.go; public BSD lists)
DA_STOP_WORDS = frozenset(
    """
og i jeg det at en den til
er som på de med han af for
ikke der var mig sig men et har
om vi min havde ham hun nu over
da fra du ud sin dem os op
man hans hvor eller hvad skal selv her
alle vil blev kunne ind når være dog
noget ville jo deres efter ned skulle denne
end dette mit også under have dig anden
hende mine alt meget sit sine vor mod
disse hvis din nogle hos blive mange ad
bliver hendes været thi jer sådan
""".split()
)


# Hindi (Lucene list) stop words (reference stop_words_hi.go; public BSD lists)
HI_STOP_WORDS = frozenset(
    """
अंदर अत अपना अपनी अपने अभी आदि आप
इत्यादि इन इनका इन्हीं इन्हें इन्हों इस इसका
इसकी इसके इसमें इसी इसे उन उनका उनकी
उनके उनको उन्हीं उन्हें उन्हों उस उसके उसी
उसे एक एवं एस ऐसे और कई कर
करता करते करना करने करें कहते कहा का
काफ़ी कि कितना किन्हें किन्हों किया किर किस
किसी किसे की कुछ कुल के को कोई
कौन कौनसा गया घर जब जहाँ जा जितना
जिन जिन्हें जिन्हों जिस जिसे जीधर जैसा जैसे
जो तक तब तरह तिन तिन्हें तिन्हों तिस
तिसे तो था थी थे दबारा दिया दुसरा
दूसरे दो द्वारा न नहीं ना निहायत नीचे
ने पर पर पहले पूरा पे फिर बनी
बही बहुत बाद बाला बिलकुल भी भीतर मगर
मानो मे में यदि यह यहाँ यही या
यिह ये रखें रहा रहे ऱ्वासा लिए लिये
लेकिन व वर्ग वह वह वहाँ वहीं वाले
वुह वे वग़ैरह संग सकता सकते सबसे सभी
साथ साबुत साभ सारा से सो ही हुआ
हुई हुए है हैं हो होता होती होते
होना होने अपनि जेसे होति सभि तिंहों इंहों
दवारा इसि किंहें थि उंहों ओर जिंहें वहिं
अभि बनि हि उंहिं उंहें हें वगेरह एसे
रवासा कोन निचे काफि उसि पुरा भितर हे
बहि वहां कोइ यहां जिंहों तिंहें किसि कइ
यहि इंहिं जिधर इंहें अदि इतयादि हुइ कोनसा
इसकि दुसरे जहां अप किंहों उनकि भि वरग
हुअ जेसा नहिं
""".split()
)
